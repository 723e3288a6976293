package graft

import graft.operators.Alerts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prometheus `for`-clause edge semantics: a run of exactly forBuckets
  * fires, a shorter one does not, a MISSING bucket breaks the run even
  * when the values around it qualify, and fired_at is the tick the
  * duration was first met — not the episode start or end.
  */
class AlertsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("for-duration firing: exact runs, broken runs, gaps") {
    import spark.implicits._
    val step = 60L
    // s1: true at 0,60,120 (fires, exactly 3), false at 180, true 240..300
    //     (2 ticks — no fire)
    // s2: true at 0,60, MISSING 120, true 180,240,300 (gap breaks; the
    //     trailing 3-run fires)
    val b = Seq(
      ("s1", 0L, 9.0), ("s1", 60L, 9.0), ("s1", 120L, 9.0),
      ("s1", 180L, 1.0), ("s1", 240L, 9.0), ("s1", 300L, 9.0),
      ("s2", 0L, 9.0), ("s2", 60L, 9.0),
      ("s2", 180L, 9.0), ("s2", 240L, 9.0), ("s2", 300L, 9.0)
    ).toDF("series", "bucket", "v")
    val got = Alerts.firing(b.repartition(4), Seq("series"), "bucket", step,
        col("v") > 5.0, forBuckets = 3)
      .orderBy("series", "episode_start")
      .collect().map(_.toSeq).toSeq
    assert(got === Seq(
      Seq("s1", 120L, 0L, 120L, 3L),
      Seq("s2", 300L, 180L, 300L, 3L)))
  }
}
