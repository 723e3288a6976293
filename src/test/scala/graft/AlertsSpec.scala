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

  test("gaps counts leading, interior, and trailing missing runs") {
    import spark.implicits._
    // 6-slot windows (period 360, step 60).
    // s1 window 0: present at 120, 180, 300 → missing 0,60 (lead 2),
    //   240 (interior 1), 360 excluded → trailing gap after 300 = 1;
    //   longest = 2.
    // s2 window 0: only slot 0 present → trailing run of 5.
    // s3 window 0: all six present → 0 missing, longest 0.
    val b = Seq(
      ("s1", 120L), ("s1", 180L), ("s1", 300L),
      ("s2", 0L),
      ("s3", 0L), ("s3", 60L), ("s3", 120L), ("s3", 180L), ("s3", 240L), ("s3", 300L)
    ).toDF("series", "bucket")
    val got = Alerts.gaps(b.repartition(3), Seq("series"), "bucket", 60L, 360L)
      .orderBy("series", "window_start").collect().map(_.toSeq).toSeq
    assert(got === Seq(
      Seq("s1", 0L, 3L, 3L, 2L),
      Seq("s2", 0L, 1L, 5L, 5L),
      Seq("s3", 0L, 6L, 0L, 0L)))
  }
}
