package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gated query: a Spark implementation plus (when SQL can
  * express it) an equivalent DuckDB oracle over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare stable:
  *  - every computed/aggregated double is `round(x, 4)` on BOTH sides;
  *  - no raw TIMESTAMP outputs — epoch seconds (BIGINT) or formatted strings;
  *  - column names identical on both sides (the compare sorts by name);
  *  - a total ORDER BY on both sides so row order is deterministic.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false,
    // timed by Bench under "extra_queries" — outside the
    // baseline-comparable total, watched for per-op regressions
    benchExtra: Boolean = false)

object Registry {
  def all: Seq[Q] =
    Relational.qs ++ TimeSeries.qs ++ SydraQlQueries.qs ++ Pipeline.qs

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }
}
