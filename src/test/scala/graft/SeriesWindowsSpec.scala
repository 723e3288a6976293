package graft

import graft.operators.SeriesWindows
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence: the day-partitioned SeriesWindows primitives
  * must produce exactly what a plain whole-series window produces, across
  * adversarial layouts — points clustered at day boundaries, sparse/empty
  * days, nulls (fill_forward), offsets n up to 3, RANGE durations shorter
  * and longer than the bucket, and random physical repartitionings (the
  * boundary-correction logic must not depend on partition placement).
  */
class SeriesWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dataset(rnd: scala.util.Random) = {
    import spark.implicits._
    val rows = (0 until 1 + rnd.nextInt(3)).flatMap { sid =>
      val nDays = 1 + rnd.nextInt(4)
      val times = scala.collection.mutable.Set[Long]()
      val n = 5 + rnd.nextInt(40)
      while (times.size < n) {
        val day = rnd.nextInt(nDays).toLong
        // half the points hug a day boundary — the hard case
        val off =
          if (rnd.nextBoolean())
            if (rnd.nextBoolean()) rnd.nextInt(700).toLong
            else 86400L - 1 - rnd.nextInt(700)
          else rnd.nextInt(86400).toLong
        times += day * 86400L + off
      }
      times.toSeq.map { t =>
        val v: Option[Double] = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(1000) / 10.0)
        (s"s$sid", sid.toLong, t, v)
      }
    }
    rows.toDF("series", "series_id", "time", "value")
      .repartition(1 + rnd.nextInt(7)) // placement must not matter
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.select("series_id", "time", "x").orderBy("series_id", "time")
      .collect().toSeq.map(_.toSeq)

  test("lagN/leadN/fillForward equal the whole-series window on adversarial layouts") {
    val rnd = new scala.util.Random(90210)
    val wAll = Window.partitionBy(col("series_id")).orderBy(col("time"))
    for (_ <- 1 to 6) {
      val df = dataset(rnd)
      val n = 1 + rnd.nextInt(3)
      assert(rows(SeriesWindows.lagN(df, "x", col("value"), n)) ===
        rows(df.withColumn("x", lag(col("value"), n).over(wAll))), s"lag($n)")
      assert(rows(SeriesWindows.leadN(df, "x", col("value"), n)) ===
        rows(df.withColumn("x", lead(col("value"), n).over(wAll))), s"lead($n)")
      assert(rows(SeriesWindows.fillForward(df, "x", col("value"))) ===
        rows(df.withColumn("x", last(col("value"), ignoreNulls = true)
          .over(wAll.rowsBetween(Window.unboundedPreceding, 0)))), "fill_forward")
    }
  }

  test("movingAvg equals the whole-series RANGE window (durations straddling the bucket)") {
    val rnd = new scala.util.Random(31415)
    for (dur <- Seq(60L, 5000L, 86400L, 90000L); _ <- 1 to 2) {
      val df = dataset(rnd)
      val want = df.withColumn("x", avg(col("value")).over(
        Window.partitionBy(col("series_id")).orderBy(col("time").cast("long"))
          .rangeBetween(-dur, 0)))
      val got = SeriesWindows.movingAvg(df, "x", col("value"), dur)
      val g = rows(got)
      val w = rows(want)
      assert(g.length === w.length, s"dur=$dur row count")
      g.zip(w).foreach { case (a, b) =>
        assert(a.take(2) === b.take(2), s"dur=$dur keys")
        (a(2), b(2)) match {
          case (null, null) => ()
          case (x: Double, y: Double) =>
            // same frame set; summation order may differ by partition → ulp
            assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)), s"dur=$dur: $x vs $y")
          case other => fail(s"dur=$dur mismatched nullability: $other")
        }
      }
    }
  }

  test("movingZScore equals the whole-series RANGE window on adversarial layouts") {
    val rnd = new scala.util.Random(2718)
    for (dur <- Seq(600L, 5000L, 90000L); _ <- 1 to 2) {
      val df = dataset(rnd)
      val w = Window.partitionBy(col("series_id")).orderBy(col("time").cast("long"))
        .rangeBetween(-dur, 0)
      val v = col("value").cast("double")
      val s1 = sum(v).over(w); val s2 = sum(v * v).over(w); val n = count(v).over(w)
      val mu = s1 / n
      val sig = sqrt(greatest((s2 / n) - (mu * mu), lit(0.0)))
      val want = rows(df.withColumn("x", when(sig > 0, (v - mu) / sig)))
      val got = rows(SeriesWindows.movingZScore(df, "x", col("value"), dur))
      assert(got.length === want.length, s"dur=$dur row count")
      got.zip(want).foreach { case (a, b) =>
        assert(a.take(2) === b.take(2), s"dur=$dur keys")
        (a(2), b(2)) match {
          case (null, null) => ()
          case (x: Double, y: Double) =>
            assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)), s"dur=$dur: $x vs $y")
          case other => fail(s"dur=$dur mismatched nullability: $other")
        }
      }
    }
  }

  test("movingZScore survives counter-like magnitudes (|μ| >> σ: the cancellation regime)") {
    import spark.implicits._
    // values ~1e8 with window σ ~1: raw Σx²/n − μ² loses every significant
    // bit (the r5 advisory). The shifted moments must recover the z the
    // pre-shifted data yields — z is shift-invariant, so the reference is
    // the same formula on (value − 1e8).
    val rnd = new scala.util.Random(777)
    val df = (0 until 200).map { i =>
      ("s0", 0L, i * 60L, Some(1e8 + math.sin(i / 3.0) + rnd.nextGaussian() * 0.1))
    }.toDF("series", "series_id", "time", "value")
    val dur = 1800L
    val w = Window.partitionBy(col("series_id")).orderBy(col("time").cast("long"))
      .rangeBetween(-dur, 0)
    val v = col("value").cast("double") - lit(1e8)
    val s1 = sum(v).over(w); val s2 = sum(v * v).over(w); val n = count(v).over(w)
    val mu = s1 / n
    val sig = sqrt(greatest((s2 / n) - (mu * mu), lit(0.0)))
    val want = rows(df.withColumn("x", when(sig > 0, (v - mu) / sig)))
    val got = rows(SeriesWindows.movingZScore(df, "x", col("value"), dur))
    assert(got.length === want.length)
    var nonNull = 0
    got.zip(want).foreach { case (a, b) =>
      assert(a.take(2) === b.take(2))
      (a(2), b(2)) match {
        case (null, null) => ()
        case (x: Double, y: Double) =>
          nonNull += 1
          assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.abs(y)), s"$x vs $y")
        case other => fail(s"mismatched nullability at offset 1e8: $other")
      }
    }
    assert(nonNull > 100, "the shifted moments must yield real z values, not σ=0 NULLs")
  }

  test("holtByKey equals the sequential driver-side recurrence on adversarial layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(40404)
    for (trial <- 1 to 8) {
      val df = dataset(rnd)
      val (alpha, beta) = (Seq(0.1, 0.3, 0.5, 0.9)(rnd.nextInt(4)), Seq(0.25, 0.5, 0.75)(rnd.nextInt(3)))
      // sequential reference per series: l1 = x1, b1 = x2 - x1, then the
      // classic recurrence over points 2..n in (time, value) order
      val want: Map[Long, Option[(Double, Double)]] = df.select("series_id", "time", "value")
        .collect().toSeq
        .flatMap(r => Option(r.get(2)).map(v =>
          (r.getLong(0), (r.getLong(1), v.asInstanceOf[Double]))))
        .groupBy(_._1).view.mapValues { rows =>
          val vs = rows.map(_._2).sorted.map(_._2)
          if (vs.length < 2) None
          else Some(vs.drop(2).foldLeft((vs(1), vs(1) - vs(0))) { case ((l, b), x) =>
            val l2 = alpha * x + (1 - alpha) * (l + b)
            (l2, beta * (l2 - l) + (1 - beta) * b)
          })
        }.toMap
      val got = SeriesWindows.holtByKey(df, col("value"), alpha, beta, Seq("series_id"))
        .select("series_id", "level", "trend").collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
      assert(got.keySet === want.keySet, s"trial=$trial keys")
      got.foreach { case (sid, (gl, gb)) =>
        (gl, gb, want(sid)) match {
          case (None, None, None) => ()
          case (Some(l: Double), Some(b: Double), Some((wl, wb))) =>
            // affine composition reassociates → ulp drift
            assert(math.abs(l - wl) <= 1e-9 * math.max(1.0, math.abs(wl)),
              s"trial=$trial sid=$sid level $l vs $wl")
            assert(math.abs(b - wb) <= 1e-9 * math.max(1.0, math.abs(wb)),
              s"trial=$trial sid=$sid trend $b vs $wb")
          case other => fail(s"trial=$trial sid=$sid mismatched nullability: $other")
        }
      }
    }
  }

  test("emaGlobal equals the sequential driver-side fold on adversarial layouts") {
    val rnd = new scala.util.Random(60601)
    for (trial <- 1 to 8) {
      val df = dataset(rnd)
      val alpha = Seq(0.1, 0.3, 0.5, 0.9)(rnd.nextInt(4))
      // sequential reference: (time, value) order, nulls skipped, y_1 = x_1
      val pts = df.select("time", "value").collect().toSeq
        .flatMap(r => Option(r.get(1)).map(v => (r.getLong(0), v.asInstanceOf[Double])))
        .sorted
      val want: Option[Double] = pts.map(_._2) match {
        case Seq() => None
        case vs => Some(vs.tail.foldLeft(vs.head)((acc, x) => alpha * x + (1 - alpha) * acc))
      }
      val got = SeriesWindows.emaGlobal(df, "x", col("value"), alpha).collect()
      assert(got.length === 1, s"trial=$trial one row")
      (Option(got.head.get(0)), want) match {
        case (None, None) => ()
        case (Some(g: Double), Some(w)) =>
          // affine composition reassociates the arithmetic → ulp-level drift
          assert(math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)),
            s"trial=$trial alpha=$alpha: $g vs $w")
        case other => fail(s"trial=$trial alpha=$alpha mismatched nullability: $other")
      }
    }
  }

  test("cusum finds a planted level shift at its exact position") {
    import spark.implicits._
    // 10 at buckets 0..11, 20 at buckets 12..23: S_i = Σ(v − 15) walks
    // down to its magnitude peak exactly at the last low bucket (i=11,
    // |S| = 60), then back up to 0. A flat series peaks at |S| = 0.
    val rows =
      (0 until 24).map(i => ("shift", i * 3600L, if (i < 12) 10.0 else 20.0)) ++
      (0 until 24).map(i => ("flat", i * 3600L, 7.5))
    val df = rows.toDF("k", "bucket", "v")
    val got = graft.operators.Trend
      .cusum(df, Seq("k"), "bucket", "v", threshold = 50.0)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(got === Seq(
      Seq("flat", 0L, 0.0, 0),
      Seq("shift", 11 * 3600L, 60.0, 1)))
  }

  test("seasonal naive recovers a planted diurnal profile and its anomaly") {
    import spark.implicits._
    // 4 days × 4 slots (period 4h, step 1h): base profile (10, 20, 30, 40)
    // every day, plus one +100 spike on day 2 slot 1. The profile mean of
    // slot 1 is 20 + 100/4 = 45; the spike's residual = 120 − 45 = 75 and
    // the other three slot-1 days get 20 − 45 = −25; all other slots 0.
    val rows = for (d <- 0 until 4; s <- 0 until 4) yield {
      val base = 10.0 * (s + 1)
      val v = if (d == 2 && s == 1) base + 100.0 else base
      ("m", d * 14400L + s * 3600L, math.floor(v * 1e4 + 0.5).toLong)
    }
    val got = graft.operators.Trend
      .seasonalNaive(rows.toDF("k", "bucket", "vi"), Seq("k"), "bucket", "vi",
        period = 14400L, step = 3600L)
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    val spike = got.find(_(1) == 2 * 14400L + 3600L).get
    assert(spike === Seq("m", 2 * 14400L + 3600L, 120.0, 45.0, 75.0))
    assert(got.count(r => r(4) == -25.0) === 3)
    assert(got.count(r => r(4) == 0.0) === 12)
  }

  test("cusum equals the exact-integer brute force on random groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(5531)
    for (trial <- 1 to 4) {
      val rows = for {
        k <- 0 until 1 + rnd.nextInt(4)
        n = 2 + rnd.nextInt(30)
        i <- 0 until n
      } yield (s"g$k", i * 3600L,
        math.floor(rnd.nextDouble() * 200 * 1e4 + 0.5) / 1e4)
      val got = graft.operators.Trend
        .cusum(rows.toDF("k", "bucket", "v"), Seq("k"), "bucket", "v", 50.0)
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
      // brute force entirely in exact integers, same identity
      val want = rows.groupBy(_._1).map { case (k, g) =>
        val vis = g.sortBy(_._2).map(t => math.floor(t._3 * 1e4 + 0.5).toLong)
        val n = vis.size.toLong
        val tot = vis.sum
        val ns = vis.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
          case (cum, idx) => math.abs(n * cum - (idx + 1) * tot)
        }
        val best = ns.zipWithIndex.maxBy { case (s, idx) => (s, -idx) }
        val cm = math.floor(best._1.toDouble / (n.toDouble * 1e4) * 1e4 + 0.5) / 1e4
        k -> ((best._2 * 3600L, cm, if (best._1.toDouble > 50.0 * n * 1e4) 1 else 0))
      }
      assert(got === want, s"trial=$trial")
    }
  }

  test("overTime pack matches a brute-force trailing-window computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = for {
      s <- Seq("a", "b")
      i <- 0 until 40
      if rnd.nextInt(5) != 0 // ragged bucket grid
    } yield (s, i.toLong * 3600, math.floor(rnd.nextDouble() * 100 * 1e4) / 1e4)
    val df = rows.toDF("series", "bucket", "v").repartition(5)
    val got = graft.operators.SeriesWindows
      .overTime(df, Seq("series"), "bucket", "v", 4 * 3600L)
      .select("series", "bucket", "min_ot", "max_ot", "sum_ot", "n_ot",
        "avg_ot", "sd_ot", "first_ot", "last_ot")
      .collect().map { r =>
        (r.getString(0), r.getLong(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5),
            r.getDouble(6), Option(r.get(7)).map(_.asInstanceOf[Double]),
            r.getDouble(8), r.getDouble(9))
      }.toMap
    val byKey = rows.groupBy(_._1)
    assert(got.size === rows.size)
    rows.foreach { case (s, b, _) =>
      val frame = byKey(s).filter(t => t._2 >= b - 14400 && t._2 <= b)
        .sortBy(_._2).map(_._3)
      val (mn, mx, sm, n, av, sd, fst, lst) = got((s, b))
      assert(mn === frame.min && mx === frame.max)
      assert(math.abs(sm - frame.sum) < 1e-9)
      assert(n === frame.size.toLong)
      assert(math.abs(av - frame.sum / frame.size) < 1e-9)
      assert(fst === frame.head && lst === frame.last)
      if (frame.size > 1) {
        val mu = frame.sum / frame.size
        val want = math.sqrt(frame.map(x => (x - mu) * (x - mu)).sum / (frame.size - 1))
        assert(math.abs(sd.get - want) < 1e-9)
      } else assert(sd.isEmpty, "singleton frame stddev must be NULL, not NaN")
    }
  }
}
