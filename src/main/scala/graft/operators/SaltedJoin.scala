package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join: replicate the small side, scatter the big
  * side.
  *
  * A shuffle join on a skewed key sends every row of a hot key to ONE
  * reducer — the straggler that dominates the stage at 100 TB (a handful
  * of event types over billions of events). Salting rewrites the join
  * `fact ⋈ dim ON key` as `fact ⋈ dim' ON (key, salt)`: the dim side is
  * replicated `salts` times (dim is dimension-sized — the replication is
  * metadata next to the fact shuffle), the fact side computes
  * `salt = hash(spread) % salts` from a high-cardinality column, and the
  * hot key's rows now spread over `salts` reducers. The OUTPUT is
  * invariant to the salt assignment — every fact row still meets exactly
  * its key's dim row — which is what the oracle gate pins.
  *
  * AQE's skew-join handles the sort-merge case adaptively at runtime;
  * explicit salting remains the tool when the skew is known ahead
  * (degenerate key domains like event types), when the join must be a
  * hash join, or on engines/paths AQE does not cover. Both are shipped:
  * AQE stays on in SparkEntry.configure, this operator makes the layout
  * explicit.
  */
object SaltedJoin {

  /** `fact ⋈ dim` on `key` with `salts`-way spreading of the fact side by
    * `spread` (a high-cardinality fact column, e.g. the event id). All
    * fact and dim columns survive; the helper salt column does not.
    */
  def join(fact: DataFrame, dim: DataFrame, key: String, spread: Column,
      salts: Int): DataFrame = {
    require(salts >= 1, "salted join needs a positive salt count")
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(spread), lit(salts.toLong)).cast("int"))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
