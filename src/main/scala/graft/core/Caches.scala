package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** House policy for the pipeline's CORPUS-SCALE intermediate caches — the
  * frames strictly LARGER than their input corpus (exploded shingle-hash
  * sets, bigram occurrences, token frames) that several consumers shuffle
  * on different keys, where re-deriving costs 2–3× the kernel work
  * (measured r17) but the cached relation itself is corpus-sized or
  * bigger.
  *
  * At bench scale the default `MEMORY_AND_DISK` (deserialized columnar
  * batches) measured fastest. At cluster scale (multi-TB relations) the
  * right level is a deployment decision — eviction churn on a hot cache
  * can exceed the recompute it saves — so the level is a session conf,
  * not a constant:
  *
  *   `spark.graft.corpusCacheLevel` = any `StorageLevel.fromString` name
  *   (default `MEMORY_AND_DISK`; e.g. `MEMORY_AND_DISK_SER` to trade CPU
  *   for footprint, `DISK_ONLY` to keep execution memory whole).
  *
  * Lifecycle note (r17 ADVICE): these caches live inside one-shot query
  * builders — the consuming action happens AFTER the builder returns, so
  * there is no in-builder point to unpersist at. The stance is
  * deliberate leak-and-evict: frames persist for the session and rely on
  * LRU eviction; long-lived sessions embedding these builders should
  * `spark.catalog.clearCache()` between logical jobs (the bench harness
  * does exactly that between extras).
  */
object Caches {
  def corpus(df: DataFrame): DataFrame = {
    val lvl = df.sparkSession.conf.get("spark.graft.corpusCacheLevel",
      "MEMORY_AND_DISK")
    df.persist(StorageLevel.fromString(lvl))
  }
}
