package graft.storage

/** Per-(dir, refresh-generation) memo for serving-path METADATA — tier
  * existence checks, cell-schema key lists, manifest file totals.
  *
  * Why: every engine-served query was paying 3–4 filesystem round-trips
  * of pure metadata (`SketchCells.exists` + `ndvTagsOf` parquet schema
  * open + `groupTagsOf` directory listing, and each routed skip-scan's
  * `m.count()` evidence) — single-digit ms locally, but at dashboard QPS
  * against an object store those are avoidable remote calls on EVERY
  * query. The values only change when a writer changes the tier, and
  * every writer is in-process ([[SketchCells.build]]/[[SketchCells.refresh]],
  * [[SkipIndex.build]]/[[SkipIndex.refresh]], the streaming maintenance
  * twins) — so each writer bumps its dir's GENERATION and readers memo
  * per (dir, generation, key). Out-of-band filesystem surgery on a tier
  * directory is outside the serving contract (the same stance as the
  * maintenance swap protocol's reader-quiescence note).
  *
  * `loads` counts memo misses (actual filesystem loads) so tests can pin
  * "N served queries → one load" and "a refresh invalidates".
  */
private[graft] object MetaCache {

  private val gen = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, String), AnyRef]()
  val loads = new java.util.concurrent.atomic.AtomicLong()

  /** Bump `dir`'s generation (writer hook) and drop its stale entries. */
  def invalidate(dir: String): Unit = {
    gen.merge(dir, 1L, (a, b) => a + b)
    val it = memo.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == dir) it.remove()
  }

  /** Memoized `load` under the dir's current generation. */
  def cached[T <: AnyRef](dir: String, key: String)(load: => T): T = {
    val g: Long = gen.getOrDefault(dir, 0L)
    memo.computeIfAbsent((dir, g, key), _ => {
      loads.incrementAndGet(); load
    }).asInstanceOf[T]
  }
}
