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
  * every writer calls [[invalidate]] ([[SketchCells.build]]/
  * [[SketchCells.refresh]], [[SkipIndex.build]]/[[SkipIndex.refresh]],
  * the streaming maintenance twins).
  *
  * Cross-JVM freshness (r15): the generation is PERSISTED — every
  * [[invalidate]] rewrites a `_meta_generation` marker file in the dir
  * (monotonic mtime: a writer that lands within the previous marker's
  * millisecond bumps the timestamp explicitly), and [[cached]] keys the
  * memo on the marker's stat (mtime:length — ONE filesystem stat per
  * lookup, still metadata-only) combined with the in-process counter.
  * A separate maintenance JVM's refresh therefore invalidates a
  * long-lived serving JVM's memo at its next query — the in-process
  * counter alone could never see it. Out-of-band filesystem surgery
  * that bypasses `invalidate` remains outside the serving contract
  * (the maintenance swap protocol's reader-quiescence stance).
  *
  * `loads` counts memo misses (actual filesystem loads) so tests can pin
  * "N served queries → one load" and "a refresh invalidates".
  */
private[graft] object MetaCache {

  private[storage] val MarkerName = "_meta_generation"

  private val gen = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  // last generation key observed per dir — lets a cross-JVM bump purge
  // the dir's stale entries instead of leaking them
  private val seen = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), AnyRef]()
  val loads = new java.util.concurrent.atomic.AtomicLong()

  // one Configuration per process: newHadoopConf() copies every session
  // property, far too heavy for a per-lookup stat; FS settings do not
  // change mid-process in this engine's deployment shape
  @volatile private var conf: org.apache.hadoop.conf.Configuration = _
  private def hadoopConf(): org.apache.hadoop.conf.Configuration = {
    if (conf == null) conf =
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration())
    conf
  }

  private def markerPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, MarkerName)

  /** The persisted half of the generation key: the marker's mtime:length
    * from ONE `getFileStatus` call, or "absent" when no writer has ever
    * stamped this dir (then the in-process counter is the whole key).
    */
  private def extGen(dir: String): String =
    try {
      val p = markerPath(dir)
      val st = p.getFileSystem(hadoopConf()).getFileStatus(p)
      st.getModificationTime.toString + ":" + st.getLen
    } catch { case _: Throwable => "absent" }

  private def genKey(dir: String): String =
    gen.getOrDefault(dir, 0L).toString + "/" + extGen(dir)

  /** Bump `dir`'s generation (writer hook): advance the in-process
    * counter, drop the dir's memo entries, and stamp the persisted
    * marker so readers in OTHER JVMs reload too. The marker's mtime is
    * forced strictly past the previous marker's (same-millisecond
    * writers would otherwise produce an identical stat).
    */
  def invalidate(dir: String): Unit = {
    gen.merge(dir, 1L, (a, b) => a + b)
    val it = memo.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == dir) it.remove()
    try {
      val p = markerPath(dir)
      val fs = p.getFileSystem(hadoopConf())
      val prevMtime =
        try fs.getFileStatus(p).getModificationTime catch { case _: Throwable => 0L }
      val out = fs.create(p, true)
      try out.write(
        (System.nanoTime().toString + ":" + gen.get(dir)).getBytes("UTF-8"))
      finally out.close()
      if (fs.getFileStatus(p).getModificationTime <= prevMtime)
        fs.setTimes(p, prevMtime + 1, -1)
    } catch {
      // dir may not exist yet (a tier about to be built) — the
      // in-process counter still bumped, same-JVM readers stay correct
      case _: Throwable => ()
    }
  }

  /** Memoized `load` under the dir's current generation (in-process
    * counter + persisted marker stat — one FS stat per lookup).
    */
  def cached[T <: AnyRef](dir: String, key: String)(load: => T): T = {
    val g = genKey(dir)
    val prev = seen.put(dir, g)
    if (prev != null && prev != g) {
      // another JVM moved the marker: purge this dir's stale entries
      val it = memo.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k._1 == dir && k._2 != g) it.remove()
      }
    }
    memo.computeIfAbsent((dir, g, key), _ => {
      loads.incrementAndGet(); load
    }).asInstanceOf[T]
  }
}
