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

  test("gaps dedups duplicate (keys, bucket) rows instead of inflating n_present") {
    import spark.implicits._
    // s1 present at 0 and 60 — but 60 arrives TWICE (e.g. a rollup
    // re-emit). Without the defensive distinct this counted 3 present in
    // a 6-slot window; n_missing must stay 4 and the trailing run 4.
    val b = Seq(("s1", 0L), ("s1", 60L), ("s1", 60L)).toDF("series", "bucket")
    val got = Alerts.gaps(b.repartition(2), Seq("series"), "bucket", 60L, 360L)
      .collect().map(_.toSeq).toSeq
    assert(got === Seq(Seq("s1", 0L, 2L, 4L, 4L)))
  }

  test("gapsWithSpine reports fully-dark (key, window) cells from the key universe") {
    import spark.implicits._
    // Bucketed frame only knows s1 (present in window 0 at slots 1,2 and
    // nothing in window 1); s2 exists only in the key universe — a series
    // that went completely dark. Spine spans 2 windows ([0, 720), period
    // 360): s1/w0 partial, s1/w1 absent, s2 both windows absent.
    val b = Seq(("s1", 60L), ("s1", 120L)).toDF("series", "bucket")
    val keys = Seq("s1", "s2", "s2").toDF("series") // dupes collapse
    val got = Alerts.gapsWithSpine(b.repartition(2), keys, Seq("series"),
        "bucket", 60L, 360L, rangeStart = 0L, rangeEnd = 720L)
      .orderBy("series", "window_start").collect().map(_.toSeq).toSeq
    assert(got === Seq(
      Seq("s1", 0L, 2L, 4L, 3L),   // slots 1,2 present; trailing 3,4,5 missing
      Seq("s1", 360L, 0L, 6L, 6L), // dark window of a known series
      Seq("s2", 0L, 0L, 6L, 6L),   // series absent from the frame entirely
      Seq("s2", 360L, 0L, 6L, 6L)))
  }

  test("gapsWithSpine rejects a misaligned rangeStart") {
    import spark.implicits._
    val b = Seq(("s1", 60L)).toDF("series", "bucket")
    assertThrows[IllegalArgumentException] {
      Alerts.gapsWithSpine(b, b.select("series"), Seq("series"),
        "bucket", 60L, 360L, rangeStart = 100L, rangeEnd = 720L)
    }
  }
}
