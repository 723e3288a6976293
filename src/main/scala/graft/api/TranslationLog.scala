package graft.api

import java.util.concurrent.atomic.AtomicLong

/** Global SQL→sydraQL translation recorder, behavior-matched to the
  * reference's compat logger + stats
  * (`/root/reference/src/sydra/compat/log.zig:4-53`, `compat/stats.zig`):
  * counts translations / fallbacks / cache hits, and emits a sampled JSONL
  * line per translation to stderr —
  * `{ts, event:"compat.translate", sql, sydraql, cache, fallback,
  * duration_ns}`.
  */
object TranslationLog {

  @volatile var enabled = true
  @volatile var sampleEvery = 1

  private val counter = new AtomicLong
  val translations = new AtomicLong
  val fallbacks = new AtomicLong
  val cacheHits = new AtomicLong

  // ObjectMapper is expensive to build and thread-safe to share
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def shouldRecord(): Boolean =
    enabled && counter.getAndIncrement() % math.max(sampleEvery, 1) == 0

  /** Memoized translations keyed on the raw SQL text, mirroring the
    * reference's compat cache + `cache_hits` counter
    * (`/root/reference/src/sydra/compat/stats.zig:22-33`). Bounded: a full
    * cache is flushed wholesale (translation is cheap; the cache exists for
    * the hot repeated-statement path, not as a persistent store).
    */
  private val CacheMax = 1024
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Translator.Result]()

  /** Translate with caching, timing, counters, and the sampled JSONL
    * emission — the wrapper both servers call (`translator.zig:85-205`
    * record sites).
    */
  def translate(sql: String): Translator.Result = {
    val t0 = System.nanoTime()
    val cached = cache.get(sql)
    val result =
      if (cached != null) cached
      else {
        val r = Translator.translate(sql)
        if (cache.size >= CacheMax) cache.clear()
        cache.put(sql, r)
        r
      }
    val durationNs = System.nanoTime() - t0
    result match {
      case Translator.Success(sydraql) => record(sql, sydraql, usedCache = cached != null, fellBack = false, durationNs)
      case _: Translator.Failure => record(sql, "", usedCache = cached != null, fellBack = true, durationNs)
    }
    result
  }

  def record(sql: String, translated: String, usedCache: Boolean, fellBack: Boolean, durationNs: Long): Unit = {
    if (fellBack) fallbacks.incrementAndGet() else translations.incrementAndGet()
    if (usedCache) cacheHits.incrementAndGet()
    if (shouldRecord()) {
      val o = mapper.createObjectNode()
      o.put("ts", System.currentTimeMillis())
      o.put("event", "compat.translate")
      o.put("sql", sql)
      o.put("sydraql", translated)
      o.put("cache", usedCache)
      o.put("fallback", fellBack)
      o.put("duration_ns", durationNs)
      Console.err.println(mapper.writeValueAsString(o))
    }
  }
}
