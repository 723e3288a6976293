package graft

import graft.core.Tables
import graft.sydraql.{CompileOptions, Engine}
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzing: seeded random sydraQL queries executed through
  * our lexer→parser→validator→compiler pipeline must agree with the
  * equivalent ANSI SQL executed by Spark's own SQL engine (an independent
  * parse/plan path) on the same data. Catches compiler bugs the
  * hand-written corpus misses: operator precedence, bucket arithmetic,
  * filter placement, limit/order interaction, all-float arithmetic.
  */
class DifferentialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val seriesNames = Seq("signup", "click", "error", "view", "purchase")
  private lazy val t0: Long = {
    val v = Tables.seriesView(spark, sf)
    v.createOrReplaceTempView("diff_sv")
    spark.sql("select min(time) from diff_sv").head().getLong(0)
  }

  /** 9-significant-digit canonical form — the two engines aggregate in
    * different orders, so doubles match to ~1 ulp, not bit-exactly.
    */
  private def canon(v: Any): String = v match {
    case null => "\u0000"
    case d: java.lang.Double =>
      if (d.isNaN) "nan"
      else if (d == 0.0) "0"
      else {
        val scale = 9 - math.floor(math.log10(math.abs(d))).toInt - 1
        BigDecimal(d).setScale(scale, BigDecimal.RoundingMode.HALF_UP).bigDecimal.stripTrailingZeros.toPlainString
      }
    case x => x.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame, ordered: Boolean): Seq[String] = {
    val r = df.collect().toSeq.map(_.toSeq.map(canon).mkString("|"))
    if (ordered) r else r.sorted
  }

  private def compare(sydraql: String, ansi: String, ordered: Boolean): Unit = {
    t0 // force view registration
    val got = rows(Engine.sql(spark, Tables.seriesView(spark, sf), sydraql,
      CompileOptions(now = 2000000000L)), ordered)
    val want = rows(spark.sql(ansi), ordered)
    assert(got === want, s"\nsydraql: $sydraql\nansi:    $ansi")
  }

  test("random bucketed aggregations agree with Spark SQL") {
    val rnd = new scala.util.Random(42)
    val aggs = Seq(
      ("avg(value)", "avg(value)"),
      ("sum(value)", "sum(value)"),
      ("min(value)", "min(value)"),
      ("max(value)", "max(value)"),
      ("count(value)", "count(value)"),
      ("percentile(value, 0.5)", "percentile(value, 0.5)"),
      ("percentile(value, 0.9)", "percentile(value, 0.9)"))
    for (i <- 1 to 30) {
      val series = seriesNames(rnd.nextInt(seriesNames.length))
      val step = Seq(60L, 300L, 3600L, 7200L)(rnd.nextInt(4))
      val lo = t0 + rnd.nextInt(4) * 3600L
      val hi = lo + (1 + rnd.nextInt(47)) * 3600L
      val picked = rnd.shuffle(aggs).take(1 + rnd.nextInt(3))
      val valuePred = if (rnd.nextBoolean()) {
        val cmp = Seq(">", "<", ">=", "<=")(rnd.nextInt(4))
        val c = rnd.nextInt(200) - 100
        s" and value $cmp $c"
      } else ""
      val desc = rnd.nextBoolean()
      val lim = if (rnd.nextBoolean()) s" limit ${1 + rnd.nextInt(10)}" else ""
      val sdProj = picked.zipWithIndex.map { case ((s, _), j) => s"$s as a$j" }.mkString(", ")
      val sqlProj = picked.zipWithIndex.map { case ((_, s), j) => s"$s as a$j" }.mkString(", ")
      val ord = if (desc) "desc" else "asc"
      compare(
        s"select time_bucket($step, time) as b, $sdProj from $series " +
          s"where time >= $lo and time < $hi$valuePred " +
          s"group by time_bucket($step, time) order by b $ord$lim",
        s"select cast(floor(time / $step) as bigint) * $step as b, $sqlProj from diff_sv " +
          s"where series = '$series' and time >= $lo and time < $hi$valuePred " +
          s"group by 1 order by b $ord$lim",
        ordered = true)
    }
  }

  test("random scan/filter/projection queries agree with Spark SQL") {
    val rnd = new scala.util.Random(7)
    for (i <- 1 to 20) {
      val series = seriesNames(rnd.nextInt(seriesNames.length))
      val lo = t0 + rnd.nextInt(24) * 3600L
      val hi = lo + (1 + rnd.nextInt(24)) * 3600L
      // all-float arithmetic on value only (sydraQL coerces time math to
      // float; ANSI would keep it integral — excluded by design)
      val proj = Seq(
        ("value", "value"),
        ("value * 2 + 1", "value * 2 + 1"),
        ("abs(value) + sqrt(abs(value))", "abs(value) + sqrt(abs(value))"))(rnd.nextInt(3))
      val valuePred = if (rnd.nextBoolean()) s" and value >= ${rnd.nextInt(100)}" else ""
      compare(
        s"select time, ${proj._1} as x from $series " +
          s"where time >= $lo and time < $hi$valuePred",
        s"select time, cast(${proj._2} as double) as x from diff_sv " +
          s"where series = '$series' and time >= $lo and time < $hi$valuePred",
        ordered = false)
    }
  }

  test("random queries via the pg-SQL translate path agree end-to-end") {
    val rnd = new scala.util.Random(4242)
    for (i <- 1 to 10) {
      val series = seriesNames(rnd.nextInt(seriesNames.length))
      val step = Seq(300L, 3600L)(rnd.nextInt(2))
      val lo = t0 + rnd.nextInt(6) * 3600L
      val hi = lo + (1 + rnd.nextInt(24)) * 3600L
      val q = s"SELECT time_bucket($step, time) as b, avg(value) as a FROM $series " +
        s"WHERE time >= $lo AND time < $hi " +
        s"GROUP BY time_bucket($step, time) ORDER BY b"
      val translated = graft.api.Translator.translate(q) match {
        case graft.api.Translator.Success(s) => s
        case f => fail(s"translator rejected: $q → $f")
      }
      compare(translated,
        s"select cast(floor(time / $step) as bigint) * $step as b, avg(value) as a " +
          s"from diff_sv where series = '$series' and time >= $lo and time < $hi " +
          s"group by 1 order by b",
        ordered = true)
    }
  }

  test("random fill(const/previous) queries agree with a Spark SQL spine") {
    val rnd = new scala.util.Random(1234)
    for (i <- 1 to 12) {
      val series = seriesNames(rnd.nextInt(seriesNames.length))
      val step = Seq(60L, 300L, 900L)(rnd.nextInt(3))
      val lo = t0 + rnd.nextInt(12) * 3600L
      val hi = lo + (1 + rnd.nextInt(12)) * 3600L
      val (fillClause, filledExpr) = rnd.nextInt(3) match {
        case 0 =>
          val c = rnd.nextInt(50)
          (s"fill($c)", s"coalesce(a, cast($c as double))")
        case 1 =>
          ("fill(previous)",
            "last_value(a, true) over (order by b rows between unbounded preceding and current row)")
        case _ =>
          // linear interpolation between surrounding non-null buckets;
          // edge gaps stay null (null propagation through pv/nv)
          val pv = "last_value(a, true) over (order by b rows between unbounded preceding and 1 preceding)"
          val pb = "last_value(case when a is not null then b end, true) over (order by b rows between unbounded preceding and 1 preceding)"
          val nv = "first_value(a, true) over (order by b rows between 1 following and unbounded following)"
          val nb = "first_value(case when a is not null then b end, true) over (order by b rows between 1 following and unbounded following)"
          ("fill(linear)",
            s"case when a is not null then a else ($pv) + (($nv) - ($pv)) * (b - ($pb)) / (($nb) - ($pb)) end")
      }
      compare(
        s"select time_bucket($step, time) as b, avg(value) as a from $series " +
          s"where time >= $lo and time < $hi " +
          s"group by time_bucket($step, time) $fillClause order by b",
        s"""with agg as (
           |  select cast(floor(time / $step) as bigint) * $step as b, avg(value) as a
           |  from diff_sv where series = '$series' and time >= $lo and time < $hi group by 1
           |), spine as (
           |  select explode(sequence((select min(b) from agg), (select max(b) from agg), $step)) as b
           |), j as (select spine.b, agg.a from spine left join agg on spine.b = agg.b)
           |select b, $filledExpr as a from j order by b""".stripMargin,
        ordered = true)
    }
  }

  test("random window functions (lag/lead/moving_avg) agree with Spark SQL") {
    // window order must be total for a deterministic comparison: dedup to
    // one row per (series_id, time) first, same frame on both sides
    val dedup = Tables.seriesView(spark, sf)
      .groupBy("series", "series_id", "time")
      .agg(org.apache.spark.sql.functions.avg("value").as("value"))
      .withColumn("tags", org.apache.spark.sql.functions.map()
        .cast("map<string,string>"))
      .select("series", "series_id", "tags", "time", "value")
    dedup.createOrReplaceTempView("diff_dd")
    val rnd = new scala.util.Random(777)
    for (i <- 1 to 12) {
      val series = seriesNames(rnd.nextInt(seriesNames.length))
      val lo = t0 + rnd.nextInt(12) * 3600L
      val hi = lo + (1 + rnd.nextInt(12)) * 3600L
      val (sd, ansi) = rnd.nextInt(3) match {
        case 0 => ("lag(value)", "lag(value) over (partition by series_id order by time)")
        case 1 => ("lead(value, 2)", "lead(value, 2) over (partition by series_id order by time)")
        case _ =>
          val dur = Seq(300, 600, 1800)(rnd.nextInt(3))
          (s"moving_avg(value, $dur)",
            s"avg(value) over (partition by series_id order by time range between $dur preceding and current row)")
      }
      val got = rows(Engine.sql(spark, dedup,
        s"select time, $sd as x from $series where time >= $lo and time < $hi",
        CompileOptions(now = 2000000000L)), ordered = false)
      val want = rows(spark.sql(
        s"select time, $ansi as x from diff_dd where series = '$series' " +
          s"and time >= $lo and time < $hi"), ordered = false)
      assert(got === want, s"\nsydraql window: $sd  series=$series [$lo,$hi)")
    }
  }

  test("random ungrouped integral/irate agree with a single-window Spark SQL pass") {
    // exercises the day-partitioned pre-pass + cross-day boundary
    // correction: ranges span up to 96 h (several 86400 s partitions), and
    // the ANSI twin computes the same answer with one global window. A
    // tie-free (deduped) source makes the window order total on both sides.
    val dedup = Tables.seriesView(spark, sf)
      .groupBy("series", "series_id", "time")
      .agg(org.apache.spark.sql.functions.avg("value").as("value"))
      .withColumn("tags", org.apache.spark.sql.functions.map()
        .cast("map<string,string>"))
      .select("series", "series_id", "tags", "time", "value")
    dedup.createOrReplaceTempView("diff_gi")
    val rnd = new scala.util.Random(31337)
    for (i <- 1 to 12) {
      val series = seriesNames(rnd.nextInt(seriesNames.length))
      val lo = t0 + rnd.nextInt(24) * 3600L
      val hi = lo + (1 + rnd.nextInt(96)) * 3600L
      val integral = rnd.nextBoolean()
      val (sd, ansi) =
        // twin orders ties by (time, value) like the engine's pre-pass:
        // dedup is per series_id, but the query spans all series_ids of
        // one series name, so cross-user same-second ties still exist
        if (integral)
          ("integral(value)",
            s"""with f as (select time, value from diff_gi where series = '$series'
               |           and time >= $lo and time < $hi),
               |p as (select time, value, lag(time) over (order by time, value) as pt,
               |             lag(value) over (order by time, value) as pv from f)
               |select coalesce(sum((time - pt) * (value + pv) / 2), 0.0) as x from p""".stripMargin)
        else
          ("irate(value)",
            s"""with f as (select time, value from diff_gi where series = '$series'
               |           and time >= $lo and time < $hi),
               |r as (select time, value, row_number() over (order by time desc, value desc) as rn from f)
               |select case when count(value) >= 2
               |                 and max(case when rn = 1 then time end) > max(case when rn = 2 then time end)
               |            then (max(case when rn = 1 then value end) - max(case when rn = 2 then value end))
               |                 / (max(case when rn = 1 then time end) - max(case when rn = 2 then time end)) end as x
               |from r""".stripMargin)
      val got = rows(Engine.sql(spark, dedup,
        s"select $sd as x from $series where time >= $lo and time < $hi",
        CompileOptions(now = 2000000000L)), ordered = false)
      val want = rows(spark.sql(ansi), ordered = false)
      assert(got === want, s"\nsydraql: $sd  series=$series [$lo,$hi)")
    }
  }

  test("random tag-grouped integral/irate/ema agree with keyed Spark SQL twins") {
    // exercises the KEYED day-partitioned pre-pass (window inside
    // (tag, day) + cross-day boundary join) and the keyed two-phase ema
    // fold against per-tag single-window / sequential-fold ANSI twins.
    import org.apache.spark.sql.functions._
    val dedup = Tables.seriesView(spark, sf)
      .withColumn("usr", col("tags")("user"))
      .groupBy("series", "usr", "time")
      .agg(avg("value").as("value"))
    dedup.createOrReplaceTempView("diff_kg")
    val src = dedup.select(col("series"), lit(0L).as("series_id"),
      map(lit("user"), col("usr")).as("tags"), col("time"), col("value"))
    val rnd = new scala.util.Random(777)
    for (i <- 1 to 12) {
      val series = seriesNames(rnd.nextInt(seriesNames.length))
      val lo = t0 + rnd.nextInt(24) * 3600L
      val hi = lo + (1 + rnd.nextInt(96)) * 3600L
      val fCte = s"(select usr, time, value from diff_kg where series = '$series' " +
        s"and time >= $lo and time < $hi)"
      val (sd, ansi) = rnd.nextInt(3) match {
        case 0 =>
          ("integral(value)",
            s"""with p as (select usr, time, value,
               |             lag(time) over (partition by usr order by time, value) as pt,
               |             lag(value) over (partition by usr order by time, value) as pv
               |           from $fCte f)
               |select usr, coalesce(sum((time - pt) * (value + pv) / 2), 0.0) as x
               |from p group by usr""".stripMargin)
        case 1 =>
          ("irate(value)",
            s"""with r as (select usr, time, value,
               |             row_number() over (partition by usr order by time desc, value desc) as rn
               |           from $fCte f)
               |select usr, case when count(value) >= 2
               |                 and max(case when rn = 1 then time end) > max(case when rn = 2 then time end)
               |            then (max(case when rn = 1 then value end) - max(case when rn = 2 then value end))
               |                 / (max(case when rn = 1 then time end) - max(case when rn = 2 then time end)) end as x
               |from r group by usr""".stripMargin)
        case _ =>
          val alpha = Seq(0.2, 0.5, 0.8)(rnd.nextInt(3))
          (s"ema(value, 60, $alpha)",
            s"""select usr, aggregate(
               |         slice(pts, 2, greatest(size(pts) - 1, 0)),
               |         element_at(pts, 1).v,
               |         (acc, x) -> cast($alpha as double) * x.v + cast(${1 - alpha} as double) * acc) as x
               |from (select usr, array_sort(collect_list(struct(time as t, cast(value as double) as v))) as pts
               |      from diff_kg where series = '$series' and time >= $lo and time < $hi
               |      group by usr)""".stripMargin)
      }
      val got = rows(Engine.sql(spark, src,
        s"select tag.user as usr, $sd as x from $series where time >= $lo and time < $hi group by tag.user",
        CompileOptions(now = 2000000000L)), ordered = false)
      val want = rows(spark.sql(ansi), ordered = false)
      assert(got === want, s"\nsydraql: $sd  series=$series [$lo,$hi)")
    }
    // MULTI-key: (tag, bucket) grouping — the pre-pass carries both keys
    // plus the day column through windows and boundary joins
    for (i <- 1 to 6) {
      val series = seriesNames(rnd.nextInt(seriesNames.length))
      val lo = t0 + rnd.nextInt(24) * 3600L
      val hi = lo + (1 + rnd.nextInt(96)) * 3600L
      val step = Seq(3600L, 86400L, 172800L)(rnd.nextInt(3))
      val got = rows(Engine.sql(spark, src,
        s"select tag.user as usr, time_bucket($step, time) as b, integral(value) as x " +
          s"from $series where time >= $lo and time < $hi group by tag.user, time_bucket($step, time)",
        CompileOptions(now = 2000000000L)), ordered = false)
      val want = rows(spark.sql(
        s"""with p as (select usr, cast(floor(time / $step.0) as bigint) * $step as b, time, value,
           |             lag(time) over (partition by usr, cast(floor(time / $step.0) as bigint) order by time, value) as pt,
           |             lag(value) over (partition by usr, cast(floor(time / $step.0) as bigint) order by time, value) as pv
           |           from diff_kg where series = '$series' and time >= $lo and time < $hi)
           |select usr, b, coalesce(sum((time - pt) * (value + pv) / 2), 0.0) as x
           |from p group by usr, b""".stripMargin), ordered = false)
      assert(got === want, s"\nmulti-key integral step=$step series=$series [$lo,$hi)")
    }
  }

  test("random global aggregations agree with Spark SQL") {
    val rnd = new scala.util.Random(99)
    for (i <- 1 to 10) {
      val series = seriesNames(rnd.nextInt(seriesNames.length))
      val lo = t0 + rnd.nextInt(12) * 3600L
      val hi = lo + (1 + rnd.nextInt(72)) * 3600L
      compare(
        s"select avg(value) as a, count(value) as c, min(value) as mn, max(value) as mx " +
          s"from $series where time >= $lo and time < $hi",
        s"select avg(value) as a, count(value) as c, min(value) as mn, max(value) as mx " +
          s"from diff_sv where series = '$series' and time >= $lo and time < $hi",
        ordered = false)
    }
  }
}
