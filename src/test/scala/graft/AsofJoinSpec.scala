package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence: the union-tag + day-partitioned as-of join must
  * produce exactly what the brute-force theta-join (latest right at or
  * before each left row per key) produces — across layouts with right rows
  * hugging day boundaries, keys with no right rows at all, left rows before
  * any right row, time-equality matches, and random physical
  * repartitionings (the carry logic must not depend on placement).
  */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def brute(left: DataFrame, right: DataFrame, tol: Option[Long]): Seq[Seq[Any]] = {
    // per left row: the max-time right row with rt <= t (unique per (k, rt))
    val j = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("l.t") >= col("r.rt"), "left")
      .groupBy(col("l.k"), col("l.t"), col("l.lv"))
      .agg(max(struct(col("r.rt"), col("r.rv"))).as("m"))
      .select(col("k"), col("t"), col("lv"), col("m.rt").as("rt"), col("m.rv").as("rv"))
    val bounded = tol match {
      case Some(w) => j.select(col("k"), col("t"), col("lv"),
        when(col("t") - col("rt") <= w, col("rt")).as("rt"),
        when(col("t") - col("rt") <= w, col("rv")).as("rv"))
      case None => j
    }
    bounded.orderBy("k", "t", "lv").collect().toSeq.map(_.toSeq)
  }

  test("backward as-of equals brute-force theta-join on adversarial layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(7113)
    for (round <- 1 to 6) {
      val nKeys = 1 + rnd.nextInt(4)
      val lRows = (0 until 30 + rnd.nextInt(60)).map { i =>
        val day = rnd.nextInt(4).toLong
        (s"k${rnd.nextInt(nKeys + 1)}", // +1: some keys have no right rows
          day * 86400L + (if (rnd.nextBoolean()) rnd.nextInt(600).toLong
                          else rnd.nextInt(86400).toLong),
          i.toDouble)
      }
      val rTimes = scala.collection.mutable.Set[(String, Long)]()
      while (rTimes.size < 10 + rnd.nextInt(30)) {
        val day = rnd.nextInt(4).toLong
        val off =
          if (rnd.nextBoolean()) 86400L - 1 - rnd.nextInt(600) else rnd.nextInt(86400).toLong
        rTimes += ((s"k${rnd.nextInt(nKeys)}", day * 86400L + off))
      }
      // force some exact time-equality matches
      val rAll = (rTimes.toSeq ++ lRows.take(3).map(r => (r._1, r._2))).distinct
      val left = lRows.toDF("k", "t", "lv").repartition(1 + rnd.nextInt(5))
      val right = rAll.zipWithIndex.map { case ((k, t), i) => (k, t, 1000.0 + i) }
        .toDF("k", "rt", "rv").repartition(1 + rnd.nextInt(5))

      val tol = if (round % 2 == 0) Some(3600L * (1 + rnd.nextInt(30))) else None
      val got = AsofJoin.backward(
          left.withColumnRenamed("t", "time"),
          right.withColumnRenamed("rt", "time").withColumnRenamed("rv", "rv"),
          keys = Seq("k"), timeCol = "time", rightCols = Seq("rv"),
          matchedTimeCol = "rt", tolerance = tol)
        .select(col("k"), col("time").as("t"), col("lv"), col("rt"), col("rv"))
        .orderBy("k", "t", "lv").collect().toSeq.map(_.toSeq)
      assert(got == brute(left, right, tol), s"round $round (tol=$tol)")
    }
  }

  private def bruteFwd(left: DataFrame, right: DataFrame, tol: Option[Long]): Seq[Seq[Any]] = {
    // per left row: the min-time right row with rt >= t; min over the
    // (rt, rv) struct orders by time first. Unmatched left-join rows must
    // contribute a NULL struct (skipped by min) — a struct OF nulls would
    // sort below every real match and clobber it
    val j = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("l.t") <= col("r.rt"), "left")
      .groupBy(col("l.k"), col("l.t"), col("l.lv"))
      .agg(min(when(col("r.rt").isNotNull,
        struct(col("r.rt"), col("r.rv")))).as("m"))
      .select(col("k"), col("t"), col("lv"), col("m.rt").as("rt"), col("m.rv").as("rv"))
    val bounded = tol match {
      case Some(w) => j.select(col("k"), col("t"), col("lv"),
        when(col("rt") - col("t") <= w, col("rt")).as("rt"),
        when(col("rt") - col("t") <= w, col("rv")).as("rv"))
      case None => j
    }
    bounded.orderBy("k", "t", "lv").collect().toSeq.map(_.toSeq)
  }

  test("forward as-of equals brute-force theta-join on adversarial layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(9241)
    for (round <- 1 to 6) {
      val nKeys = 1 + rnd.nextInt(4)
      val lRows = (0 until 30 + rnd.nextInt(60)).map { i =>
        val day = rnd.nextInt(4).toLong
        (s"k${rnd.nextInt(nKeys + 1)}",
          day * 86400L + (if (rnd.nextBoolean()) rnd.nextInt(600).toLong
                          else rnd.nextInt(86400).toLong),
          i.toDouble)
      }
      val rTimes = scala.collection.mutable.Set[(String, Long)]()
      while (rTimes.size < 10 + rnd.nextInt(30)) {
        val day = rnd.nextInt(4).toLong
        val off =
          if (rnd.nextBoolean()) 86400L - 1 - rnd.nextInt(600) else rnd.nextInt(86400).toLong
        rTimes += ((s"k${rnd.nextInt(nKeys)}", day * 86400L + off))
      }
      val rAll = (rTimes.toSeq ++ lRows.take(3).map(r => (r._1, r._2))).distinct
      val left = lRows.toDF("k", "t", "lv").repartition(1 + rnd.nextInt(5))
      val right = rAll.zipWithIndex.map { case ((k, t), i) => (k, t, 1000.0 + i) }
        .toDF("k", "rt", "rv").repartition(1 + rnd.nextInt(5))

      val tol = if (round % 2 == 0) Some(3600L * (1 + rnd.nextInt(30))) else None
      val got = AsofJoin.forward(
          left.withColumnRenamed("t", "time"),
          right.withColumnRenamed("rt", "time").withColumnRenamed("rv", "rv"),
          keys = Seq("k"), timeCol = "time", rightCols = Seq("rv"),
          matchedTimeCol = "rt", tolerance = tol)
        .select(col("k"), col("time").as("t"), col("lv"), col("rt"), col("rv"))
        .orderBy("k", "t", "lv").collect().toSeq.map(_.toSeq)
      assert(got == bruteFwd(left, right, tol), s"round $round (tol=$tol)")
    }
  }

  test("multiple right payload columns survive, including null payload values") {
    import spark.implicits._
    // a legitimately-NULL payload value must be carried as a match (the
    // struct resolve must not skip it), and both payload columns arrive
    val left = Seq(("a", 10L, 1), ("a", 30L, 2), ("b", 5L, 3))
      .toDF("k", "time", "id")
    val right = Seq(
        ("a", 8L, Option.empty[Double], "x"),
        ("a", 25L, Some(2.5), "y"))
      .toDF("k", "time", "rv", "tag")
    val got = AsofJoin.backward(left, right, keys = Seq("k"), timeCol = "time",
        rightCols = Seq("rv", "tag"), matchedTimeCol = "rt")
      .orderBy("k", "time")
      .select("k", "time", "id", "rt", "rv", "tag")
      .collect().map(_.toSeq).toSeq
    assert(got === Seq(
      Seq("a", 10L, 1, 8L, null, "x"),
      Seq("a", 30L, 2, 25L, 2.5, "y"),
      Seq("b", 5L, 3, null, null, null)))
  }
}
