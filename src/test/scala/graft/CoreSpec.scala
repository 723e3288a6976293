package graft

import graft.core.{Functions => F}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkEntry.configure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()
}

class CoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("xxhash64 seed-0 matches public reference vectors") {
    // Known-answer vectors for XXH64 with seed 0 (public xxHash spec).
    val got = Seq("", "abc", "a", "hello world").toDF("s")
      .select(F.xxhash64Seed(0L, col("s")).as("h")).as[Long].collect()
    assert(got(0) === 0xEF46DB3751D8E999L)
    assert(got(1) === 0x44BC2CF5AD770999L)
    assert(got(2) === 0xD24EC4F1A98C6E5BL)
    assert(got(3) === 0x45AB6734B21E6968L)
  }

  test("time_bucket floors like the reference (incl. negative ts)") {
    val df = Seq(0L, 59L, 60L, 61L, 3599L, 3600L, -1L, -3600L, -3601L).toDF("t")
    val got = df.select(F.timeBucket(lit(3600), col("t")).as("b")).as[Long].collect()
    assert(got.toSeq === Seq(0L, 0L, 0L, 0L, 0L, 3600L, -3600L, -3600L, -7200L))
  }

  test("time_bucket with origin") {
    val df = Seq(10L, 69L, 70L).toDF("t")
    val got = df.select(F.timeBucket(lit(60), col("t"), lit(10)).as("b")).as[Long].collect()
    assert(got.toSeq === Seq(10L, 10L, 70L))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and every oracle key exists") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("series view schema and determinism") {
    val sv = graft.core.Tables.seriesView(spark, sf)
    assert(sv.columns.toSeq === Seq("series", "series_id", "tags", "time", "value"))
    val ids = sv.select("series", "series_id").distinct().collect()
    assert(ids.nonEmpty)
    // same (series, tags) → same id on recompute
    val again = graft.core.Tables.seriesView(spark, sf).select("series", "series_id").distinct().collect()
    assert(ids.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("gate registry names are unique (duplicates would shadow in SparkEntry.queries)") {
    val names = graft.queries.Registry.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate gate names: ${dups.mkString(", ")}")
    // every oracle belongs to a registered query, and bench ⊆ registered
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
    assert(graft.SparkEntry.benchQueries.toSet.subsetOf(names.toSet))
  }
}
