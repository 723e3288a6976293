package graft.queries

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Core relational surface: scan/filter/project/aggregate/sort/top-K/limit
  * (SURVEY.md §2.2) plus the join/set-op superset a Spark-native engine gets
  * for free. TPC-H-ish tables from the driver test data.
  *
  * Scale notes (100 TB): every query here is a single scan + at most one
  * shuffle; dimension joins are explicit `broadcast()`; top-K compiles to
  * `TakeOrderedAndProject` (no global sort); aggregations are partial+final
  * hash aggregates.
  */
object Relational {

  def qs: Seq[Q] = Seq(
    Q("q_onerow",
      (s, _) => s.sql("SELECT 1 AS one"),
      Some("SELECT 1 AS one")),

    Q("q_scan_filter_project",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_quantity") > 45 && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_quantity > 45 AND l_shipdate < TIMESTAMP '1997-01-01'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q_agg_global",
      (s, dir) =>
        Tables.lineitem(s, dir).agg(
          (floor((avg(col("l_quantity"))) * 1e4 + 0.5) / 1e4).as("avg_qty"),
          (floor((sum(col("l_extendedprice"))) * 1e4 + 0.5) / 1e4).as("sum_price"),
          count(lit(1)).as("n_rows"),
          count(col("l_quantity")).as("n_qty"),
          (floor((min(col("l_quantity"))) * 1e4 + 0.5) / 1e4).as("min_qty"),
          (floor((max(col("l_quantity"))) * 1e4 + 0.5) / 1e4).as("max_qty")),
      Some("""SELECT floor((avg(l_quantity)) * 1e4 + 0.5) / 1e4 AS avg_qty,
             |       floor((sum(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS sum_price,
             |       count(*) AS n_rows,
             |       count(l_quantity) AS n_qty,
             |       floor((min(l_quantity)) * 1e4 + 0.5) / 1e4 AS min_qty,
             |       floor((max(l_quantity)) * 1e4 + 0.5) / 1e4 AS max_qty
             |FROM lineitem""".stripMargin)),

    Q("q_agg_group",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            (floor((sum(col("l_quantity"))) * 1e4 + 0.5) / 1e4).as("sum_qty"),
            (floor((avg(col("l_extendedprice"))) * 1e4 + 0.5) / 1e4).as("avg_price"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       floor((sum(l_quantity)) * 1e4 + 0.5) / 1e4 AS sum_qty,
             |       floor((avg(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS avg_price,
             |       count(*) AS n
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // TPC-H Q1 verbatim (pricing summary report): the flagship
    // pure-aggregation plan — no join, one fact shuffle on the 2-key
    // group, every aggregate partial+final. Headline bench.
    Q("q_pricing_summary",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            (floor((sum(col("l_quantity"))) * 1e4 + 0.5) / 1e4).as("sum_qty"),
            (floor((sum(col("l_extendedprice"))) * 1e4 + 0.5) / 1e4).as("sum_base_price"),
            (floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e4 + 0.5) / 1e4).as("sum_disc_price"),
            (floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))) * 1e4 + 0.5) / 1e4).as("sum_charge"),
            (floor((avg(col("l_quantity"))) * 1e4 + 0.5) / 1e4).as("avg_qty"),
            (floor((avg(col("l_extendedprice"))) * 1e4 + 0.5) / 1e4).as("avg_price"),
            (floor((avg(col("l_discount"))) * 1e4 + 0.5) / 1e4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       floor((sum(l_quantity)) * 1e4 + 0.5) / 1e4 AS sum_qty,
             |       floor((sum(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS sum_base_price,
             |       floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS sum_disc_price,
             |       floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 1e4 + 0.5) / 1e4 AS sum_charge,
             |       floor((avg(l_quantity)) * 1e4 + 0.5) / 1e4 AS avg_qty,
             |       floor((avg(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS avg_price,
             |       floor((avg(l_discount)) * 1e4 + 0.5) / 1e4 AS avg_disc,
             |       count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    Q("q_sort_limit_offset",
      (s, dir) =>
        Tables.orders(s, dir)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .offset(10).limit(50),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 50 OFFSET 10""".stripMargin)),

    // Compiles to TakeOrderedAndProject: bounded-memory per-partition top-K
    // + driver merge — the Catalyst twin of the reference's fused
    // sort+limit (/root/reference/src/sydra/query/operator.zig:204-210).
    Q("q_topk",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             |LIMIT 100""".stripMargin),
      bench = true),

    Q("q_join_broadcast",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val p = Tables.part(s, dir)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand"))
          .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e4 + 0.5) / 1e4).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand,
             |       floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS revenue,
             |       count(*) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      bench = true),

    Q("q_join_3way",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val li = Tables.lineitem(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e4 + 0.5) / 1e4).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |       floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS revenue,
             |       count(*) AS n
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      bench = true),

    // TPC-H Q3 (shipping priority) on the synthetic star schema — the
    // classic selective-dimension + big-fact-join + top-K plan: customer
    // segment filter broadcasts, orders⋈lineitem shuffles once on
    // orderkey, the rounded-revenue top-10 compiles to
    // TakeOrderedAndProject. Ties break on l_orderkey.
    Q("q_tpch_q3",
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            col("o_orderpriority"))
          .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e4 + 0.5) / 1e4).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             |       o_orderpriority,
             |       floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-03-15'
             |  AND l_shipdate > TIMESTAMP '1998-03-15'
             |GROUP BY 1, 2, 3
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
      benchExtra = true),

    // TPC-H Q5 (local supplier volume): the 6-table join with the
    // customer-supplier SAME-NATION equi-condition — dims broadcast,
    // the only shuffles are the fact keys (orderkey, then custkey side).
    Q("q_tpch_q5",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val c = Tables.customer(s, dir)
        val sup = Tables.supplier(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey") &&
            c("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e4 + 0.5) / 1e4).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |       floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin),
      benchExtra = true),

    // TPC-H Q18 (large-volume customer): the group-HAVING + top-K join.
    // The textbook form re-aggregates after the 3-way join; here the
    // per-order quantity aggregate runs ONCE before the joins (the
    // grouping keys are functionally determined by orderkey, so
    // pre-aggregation is semantics-identical and pushes the fact shuffle
    // below the joins — the plan a 100 TB run needs: one lineitem
    // shuffle on orderkey, HAVING prunes ~80% before any join, customer
    // broadcasts, top-100 compiles to TakeOrderedAndProject). Q1 is
    // already gated verbatim as q_pricing_summary (headline bench).
    Q("q_tpch_q18",
      (s, dir) => {
        val lq = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg((floor((sum(col("l_quantity"))) * 1e4 + 0.5) / 1e4).as("sum_qty"))
          .filter(col("sum_qty") > 150)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        lq.join(o, col("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("l_orderkey").as("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_date"), col("o_orderkey"))
          .limit(100)
      },
      Some("""WITH lq AS (
             |  SELECT l_orderkey, floor((sum(l_quantity)) * 1e4 + 0.5) / 1e4 AS sum_qty
             |  FROM lineitem GROUP BY 1 HAVING floor((sum(l_quantity)) * 1e4 + 0.5) / 1e4 > 150
             |)
             |SELECT c_name, c_custkey, o_orderkey,
             |       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             |       o_totalprice, sum_qty
             |FROM lq
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_date, o_orderkey LIMIT 100""".stripMargin),
      benchExtra = true),

    // TPC-H Q10 (returned-item reporting): selective quarter window on
    // orders + return-flag filter on the fact, customer + nation
    // broadcast, single fact shuffle on orderkey, top-20 by revenue →
    // TakeOrderedAndProject. The complement of Q18's HAVING shape:
    // filters prune BOTH fact inputs before the join.
    Q("q_tpch_q10",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e4 + 0.5) / 1e4).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |       floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-04-01'
             |  AND l_returnflag = 'R'
             |GROUP BY 1, 2, 3, 4
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      benchExtra = true),

    // TPC-H Q6 (forecasting revenue change): the pure predicate-pushdown
    // query — every filter reaches the parquet scan (shipdate range,
    // discount band, quantity cap), one global aggregate, zero shuffles
    // beyond the final partial merge. The simplest plan in the suite and
    // the one whose 100 TB cost is ENTIRELY scan-side pruning.
    Q("q_tpch_q6",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg((floor((sum(col("l_extendedprice") * col("l_discount"))) * 1e4 + 0.5) / 1e4).as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT floor((sum(l_extendedprice * l_discount)) * 1e4 + 0.5) / 1e4 AS revenue,
             |       count(*) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24""".stripMargin),
      benchExtra = true),

    // TPC-H Q14 (promotion effect): one-month fact slice, part dim
    // broadcast, conditional-vs-total revenue ratio in a single global
    // aggregate — the broadcast-join + conditional-aggregate plan. Both
    // sums ride one pass; the rounded ratio pins cross-engine sum-order
    // ulps.
    Q("q_tpch_q14",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        val p = Tables.part(s, dir)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .agg((floor(lit(100.0) *
              sum(when(col("p_type") === "PROMO",
                col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0))) /
              sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 1e4 + 0.5) / 1e4)
            .as("promo_revenue"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT floor(100.0 *
             |         sum(CASE WHEN p_type = 'PROMO'
             |             THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
             |         sum(l_extendedprice * (1 - l_discount)) * 1e4 + 0.5) / 1e4 AS promo_revenue,
             |       count(*) AS n
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
             |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin),
      benchExtra = true),

    // TPC-H Q4 (order priority checking), adapted to this schema's
    // columns: the reference predicate l_commitdate < l_receiptdate has
    // no columns here, so "late" = shipped more than 90 days after the
    // order date — same EXISTS shape, and that shape is the point: a
    // correlated EXISTS with a NON-equi residual (l_shipdate vs the
    // outer row's o_orderdate) compiling to one LeftSemi hash join on
    // orderkey with the residual evaluated in the join — no second scan,
    // no subquery re-execution per row.
    Q("q_tpch_q4",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        val li = Tables.lineitem(s, dir)
        o.join(li, o("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
             |  AND o_orderdate < TIMESTAMP '1997-10-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      benchExtra = true),

    // TPC-H Q7 (volume shipping between two nations): the disjunctive
    // two-nation pair condition. Both dimension chains (supplier→nation,
    // customer→nation) are pre-filtered to the two nations BEFORE the
    // broadcast — at 100 TB that prunes the fact to the two nations'
    // traffic inside the broadcast hash joins, and only the
    // orderkey-equi join shuffles; the pair disjunction is a residual on
    // two broadcast-provided name columns.
    Q("q_tpch_q7",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        val o = Tables.orders(s, dir)
        val nPair = Seq("NATION_10", "NATION_12")
        val n1 = Tables.nation(s, dir).filter(col("n_name").isin(nPair: _*))
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, dir).filter(col("n_name").isin(nPair: _*))
          .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        val sup = Tables.supplier(s, dir)
        val c = Tables.customer(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
          .filter((col("supp_nation") === "NATION_10" && col("cust_nation") === "NATION_12") ||
            (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_10"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e4 + 0.5) / 1e4).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |       floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND ((n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12')
             |    OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10'))
             |GROUP BY 1, 2, 3
             |ORDER BY 1, 2, 3""".stripMargin),
      benchExtra = true),

    // TPC-H Q8 (national market share): the deepest join in the suite —
    // 7 tables, every dimension broadcast, the part-type filter pruning
    // the fact FIRST (most selective, ~1/6), then one orderkey shuffle;
    // share = conditional/total revenue ratio in a single grouped pass
    // (Q14's pattern, per year).
    Q("q_tpch_q8",
      (s, dir) => {
        val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val c = Tables.customer(s, dir)
        val n1 = Tables.nation(s, dir)
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_rkey"))
        val r = Tables.region(s, dir).filter(col("r_name") === "AMERICA")
        val sup = Tables.supplier(s, dir)
        val n2 = Tables.nation(s, dir)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        Tables.lineitem(s, dir)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
          .join(broadcast(r), col("cn_rkey") === col("r_regionkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg((floor(
              sum(when(col("supp_nation") === "NATION_3",
                col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0))) /
              sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 1e4 + 0.5) / 1e4)
            .as("mkt_share"),
            count(lit(1)).as("n"))
          .orderBy(col("o_year"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |       floor(sum(CASE WHEN n2.n_name = 'NATION_3'
             |                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
             |             sum(l_extendedprice * (1 - l_discount)) * 1e4 + 0.5) / 1e4 AS mkt_share,
             |       count(*) AS n
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |JOIN region ON n1.n_regionkey = r_regionkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      benchExtra = true),

    // TPC-H Q13 (customer order-count distribution), comment-LIKE filter
    // adapted to a priority exclusion (no comment column in this
    // schema): LEFT OUTER join so zero-order customers survive with
    // c_count = 0 (count of a NULL column), then the distribution-of-
    // counts re-aggregation — two shuffles, the second over at most
    // |distinct counts| keys.
    Q("q_tpch_q13",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |      FROM customer
             |      LEFT OUTER JOIN orders ON c_custkey = o_custkey
             |        AND o_orderpriority <> '4-NOT SPECIFIED'
             |      GROUP BY c_custkey)
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin),
      benchExtra = true),

    // TPC-H Q15 (top supplier): the revenue "view" + its max, in ONE
    // lineitem pass — the per-supplier aggregate is supplier-sized, so
    // the global max rides a single-partition window over ~|suppliers|
    // rows instead of a second fact scan (the textbook scalar subquery
    // re-reads lineitem). Revenue pre-rounds before the equality compare
    // so both engines pick the same winners.
    Q("q_tpch_q15",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val rev = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e4 + 0.5) / 1e4).as("total_revenue"))
        val sup = Tables.supplier(s, dir)
        rev.withColumn("__mx", max(col("total_revenue")).over(Window.partitionBy(lit(0))))
          .filter(col("total_revenue") === col("__mx"))
          .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |         floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-04-01'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, total_revenue
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
             |ORDER BY s_suppkey""".stripMargin),
      benchExtra = true),

    // TPC-H Q17 (small-quantity-order revenue), container predicate
    // adapted to p_type (no container column): the correlated per-part
    // average threshold. The textbook correlated subquery scans lineitem
    // twice; here the threshold is a window average over the SAME
    // broadcast-joined pass — one fact scan, one partkey shuffle. The
    // avg pre-rounds at 1e-6 before the 0.2× compare so the threshold is
    // the identical double in both engines.
    Q("q_tpch_q17",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val p = Tables.part(s, dir)
          .filter(col("p_brand") === "Brand#12" && col("p_type") === "SMALL")
        val lp = Tables.lineitem(s, dir)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        val w = Window.partitionBy(col("l_partkey"))
        lp.withColumn("__thr",
            (floor(avg(col("l_quantity")).over(w) * 1e6 + 0.5) / 1e6) * 0.2)
          .filter(col("l_quantity") < col("__thr"))
          .agg((floor((sum(col("l_extendedprice"))) / 7.0 * 1e4 + 0.5) / 1e4).as("avg_yearly"),
            count(lit(1)).as("n"))
      },
      Some("""WITH lp AS (
             |  SELECT l_quantity, l_extendedprice,
             |         floor(avg(l_quantity) OVER (PARTITION BY l_partkey) * 1e6 + 0.5) / 1e6 * 0.2 AS thr
             |  FROM lineitem
             |  JOIN part ON l_partkey = p_partkey
             |  WHERE p_brand = 'Brand#12' AND p_type = 'SMALL')
             |SELECT floor((sum(l_extendedprice)) / 7.0 * 1e4 + 0.5) / 1e4 AS avg_yearly,
             |       count(*) AS n
             |FROM lp WHERE l_quantity < thr""".stripMargin),
      benchExtra = true),

    // TPC-H Q19 (discounted revenue): the three-way disjunction of
    // brand × size-band × quantity-band conjuncts. All predicates are on
    // the broadcast part side or the fact row, so Catalyst pushes the
    // part disjuncts into the dimension scan and evaluates the combined
    // residual inside the broadcast join — one fact pass, no shuffle
    // before the global aggregate.
    Q("q_tpch_q19",
      (s, dir) => {
        val p = Tables.part(s, dir)
        val li = Tables.lineitem(s, dir)
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
              col("l_quantity") >= 20 && col("l_quantity") <= 30))
          .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e4 + 0.5) / 1e4).as("revenue"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS revenue,
             |       count(*) AS n
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             |       AND l_quantity >= 1 AND l_quantity <= 11)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             |       AND l_quantity >= 10 AND l_quantity <= 20)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
             |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin),
      benchExtra = true),

    // TPC-H Q22 (global sales opportunity), phone-prefix predicate
    // adapted to a nationkey set (no phone column): positive-balance
    // customers above the mean balance with no RECENT orders (every
    // synthetic customer has some order, so "never ordered" is empty at
    // every SF — the recency cutoff keeps the anti join non-vacuous) —
    // scalar-subquery threshold (broadcast one-row frame, avg
    // pre-rounded 1e-6) + anti join. The anti join shuffles on custkey;
    // everything else is customer-sized.
    Q("q_tpch_q22",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val avgBal = cust.filter(col("c_acctbal") > 0.0)
          .agg((floor(avg(col("c_acctbal")) * 1e6 + 0.5) / 1e6).as("__ab"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
        cust.filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
          .crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("__ab"))
          .join(o, cust("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").cast("long").as("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            (floor((sum(col("c_acctbal"))) * 1e4 + 0.5) / 1e4).as("totacctbal"))
          .orderBy(col("cntrycode"))
      },
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
             |       count(*) AS numcust,
             |       floor((sum(c_acctbal)) * 1e4 + 0.5) / 1e4 AS totacctbal
             |FROM customer
             |WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
             |  AND c_acctbal > (SELECT floor(avg(c_acctbal) * 1e6 + 0.5) / 1e6
             |                   FROM customer WHERE c_acctbal > 0.0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '2000-06-01')
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      benchExtra = true),

    // TPC-H Q12 (shipmode priority), adapted to this schema: no
    // l_shipmode/commitdate/receiptdate columns, so "late receipt" is
    // l_shipdate ≥ o_orderdate + 120 days and the grouping dimension is
    // l_linestatus. The SHAPE is Q12's verbatim: one fact⋈fact equi-join
    // on orderkey with both sides pre-filtered at the scan, then
    // conditional aggregation (CASE on o_orderpriority) — the
    // pivot-while-aggregating plan. One shuffle, no joins after the agg.
    Q("q_tpch_q12",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 120 DAYS"))
          .groupBy(col("l_linestatus"))
          .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate >= o_orderdate + INTERVAL 120 DAY
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      benchExtra = true),

    // TPC-H Q21 (suppliers who kept orders waiting), lateness adapted to
    // l_shipdate ≥ o_orderdate + 180 days (no receipt/commit dates) and
    // the nation filter to a nationkey range. The distinctive DOUBLE
    // correlation on the same fact survives intact: a late line counts
    // iff SOME other supplier shipped on the order (EXISTS → left-semi,
    // hash join on orderkey with the suppkey≠ residual) AND NO other
    // supplier was late on it (NOT EXISTS → left-anti, same keying).
    // Both probes shuffle on orderkey only; supplier + nation broadcast;
    // top-100 compiles to TakeOrderedAndProject.
    Q("q_tpch_q21",
      (s, dir) => {
        val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"))
        val late = Tables.lineitem(s, dir)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 180 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"))
        val other = li.select(col("l_orderkey").as("__ok2"), col("l_suppkey").as("__sk2"))
        val lateOther = late.select(col("l_orderkey").as("__ok3"), col("l_suppkey").as("__sk3"))
        val sup = Tables.supplier(s, dir)
        val nat = Tables.nation(s, dir).filter(col("n_nationkey") < 13)
        late
          .join(other, col("l_orderkey") === col("__ok2") &&
            col("l_suppkey") =!= col("__sk2"), "left_semi")
          .join(lateOther, col("l_orderkey") === col("__ok3") &&
            col("l_suppkey") =!= col("__sk3"), "left_anti")
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""WITH late AS (
             |  SELECT l_orderkey, l_suppkey
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderstatus = 'F'
             |    AND l_shipdate >= o_orderdate + INTERVAL 180 DAY
             |)
             |SELECT s_name, count(*) AS numwait
             |FROM late l1
             |JOIN supplier ON l1.l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_nationkey < 13
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM late l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey)
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),
      benchExtra = true),

    Q("q_semi_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q_anti_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q_distinct",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(col("o_orderstatus"), col("o_orderpriority")).distinct()
          .orderBy(col("o_orderstatus"), col("o_orderpriority")),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    Q("q_union",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
          .union(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")))
          .distinct()
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
             |UNION
             |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q_intersect",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
          .intersect(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 400000
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY o_custkey""".stripMargin)),

    Q("q_except",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
          .except(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 400000
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY o_custkey""".stripMargin)),

    Q("q_having",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg((floor((sum(col("o_totalprice"))) * 1e4 + 0.5) / 1e4).as("total"), count(lit(1)).as("n"))
          .filter(col("n") >= 15)
          .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, floor((sum(o_totalprice)) * 1e4 + 0.5) / 1e4 AS total, count(*) AS n
             |FROM orders GROUP BY o_custkey HAVING count(*) >= 15
             |ORDER BY o_custkey""".stripMargin)),

    Q("q_case_expr",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(
            when(col("o_totalprice") < 100000, lit("small"))
              .when(col("o_totalprice") < 300000, lit("medium"))
              .otherwise(lit("large")).as("size_class"))
          .agg(count(lit(1)).as("n"), (floor((avg(col("o_totalprice"))) * 1e4 + 0.5) / 1e4).as("avg_price"))
          .orderBy(col("size_class")),
      Some("""SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
             |            WHEN o_totalprice < 300000 THEN 'medium'
             |            ELSE 'large' END AS size_class,
             |       count(*) AS n, floor((avg(o_totalprice)) * 1e4 + 0.5) / 1e4 AS avg_price
             |FROM orders GROUP BY 1 ORDER BY size_class""".stripMargin)),

    // ---- multi-level aggregation (ROLLUP / CUBE / GROUPING SETS) --------
    //
    // Scale note: Spark expands grouping sets BEFORE the partial aggregate
    // (Expand operator), so an L-level rollup costs one scan + one shuffle
    // of ~L× the distinct-group rows — not L separate scans. Subtotal rows
    // are disambiguated by grouping() flags, never by NULL sentinels alone
    // (a real NULL key and a subtotal would otherwise collide). Sorting is
    // on the flags first: Spark and DuckDB disagree on default NULL order
    // (nulls-first vs nulls-last), so no nullable column is ever a sort key.

    Q("q_rollup",
      (s, dir) =>
        Tables.orders(s, dir)
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"),
            count(lit(1)).as("n"),
            (floor((sum(col("o_totalprice"))) * 1e4 + 0.5) / 1e4).as("total"))
          .select(
            col("g_status"), col("g_prio"),
            coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
            col("n"), col("total"))
          .orderBy(col("g_status"), col("g_prio"), col("status"), col("priority")),
      Some("""SELECT CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
             |       coalesce(o_orderstatus, '(all)') AS status,
             |       coalesce(o_orderpriority, '(all)') AS priority,
             |       count(*) AS n,
             |       floor((sum(o_totalprice)) * 1e4 + 0.5) / 1e4 AS total
             |FROM orders
             |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY g_status, g_prio, status, priority""".stripMargin)),

    Q("q_cube",
      (s, dir) =>
        Tables.orders(s, dir)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"),
            count(lit(1)).as("n"),
            (floor((avg(col("o_totalprice"))) * 1e4 + 0.5) / 1e4).as("avg_price"))
          .select(
            col("g_status"), col("g_prio"),
            coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
            col("n"), col("avg_price"))
          .orderBy(col("g_status"), col("g_prio"), col("status"), col("priority")),
      Some("""SELECT CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
             |       coalesce(o_orderstatus, '(all)') AS status,
             |       coalesce(o_orderpriority, '(all)') AS priority,
             |       count(*) AS n,
             |       floor((avg(o_totalprice)) * 1e4 + 0.5) / 1e4 AS avg_price
             |FROM orders
             |GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY g_status, g_prio, status, priority""".stripMargin)),

    // GROUPING SETS with asymmetric sets — (status, priority-only) — the
    // shape neither ROLLUP nor CUBE produces.
    Q("q_grouping_sets",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"),
            count(lit(1)).as("n"),
            (floor((sum(col("o_totalprice"))) * 1e4 + 0.5) / 1e4).as("total"))
          .select(
            col("g_status"), col("g_prio"),
            coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
            col("n"), col("total"))
          .orderBy(col("g_status"), col("g_prio"), col("status"), col("priority")),
      Some("""SELECT CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
             |       coalesce(o_orderstatus, '(all)') AS status,
             |       coalesce(o_orderpriority, '(all)') AS priority,
             |       count(*) AS n,
             |       floor((sum(o_totalprice)) * 1e4 + 0.5) / 1e4 AS total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
             |ORDER BY g_status, g_prio, status, priority""".stripMargin)),

    // ---- rank-family window functions -----------------------------------
    //
    // The total ORDER BY (price desc, key) makes every rank deterministic;
    // both engines use the identical frame so percent_rank/cume_dist agree
    // to the rounded 4 decimals. Filter first so the windowed row count is
    // the interesting top slice, not the full table.
    Q("q_rank_fns",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .filter(col("o_totalprice") > 350000)
          .select(
            col("o_orderstatus"), col("o_orderkey"),
            (floor(col("o_totalprice") * 1e4 + 0.5) / 1e4).as("price"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            row_number().over(w).cast("long").as("rn"),
            ntile(4).over(w).cast("long").as("quartile"),
            (floor(percent_rank().over(w) * 1e4 + 0.5) / 1e4).as("pct_rank"),
            (floor(cume_dist().over(w) * 1e4 + 0.5) / 1e4).as("cdist"))
          .orderBy(col("o_orderstatus"), col("rn"))
      },
      Some("""SELECT o_orderstatus, o_orderkey,
             |       floor(o_totalprice * 1e4 + 0.5) / 1e4 AS price,
             |       CAST(rank() OVER w AS BIGINT) AS rnk,
             |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             |       CAST(row_number() OVER w AS BIGINT) AS rn,
             |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |       floor(percent_rank() OVER w * 1e4 + 0.5) / 1e4 AS pct_rank,
             |       floor(cume_dist() OVER w * 1e4 + 0.5) / 1e4 AS cdist
             |FROM orders
             |WHERE o_totalprice > 350000
             |WINDOW w AS (PARTITION BY o_orderstatus
             |             ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_orderstatus, rn""".stripMargin)),

    // ---- PIVOT ----------------------------------------------------------
    //
    // Pivot values are listed explicitly: at 100 TB the implicit form runs
    // an extra distinct-values job over the fact table before it can even
    // plan, and an unbounded value set would explode the schema. With
    // literal values this is one partial+final hash aggregate — exactly the
    // CASE-sum the oracle spells out.
    Q("q_pivot",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg((floor((sum(col("o_totalprice"))) * 1e4 + 0.5) / 1e4))
          .select(col("o_orderpriority").as("priority"),
            col("F").as("total_f"), col("O").as("total_o"), col("P").as("total_p"))
          .orderBy(col("priority")),
      Some("""SELECT o_orderpriority AS priority,
             |       floor((sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)) * 1e4 + 0.5) / 1e4 AS total_f,
             |       floor((sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END)) * 1e4 + 0.5) / 1e4 AS total_o,
             |       floor((sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END)) * 1e4 + 0.5) / 1e4 AS total_p
             |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin)),

    // ---- UNPIVOT (melt) -------------------------------------------------
    //
    // The inverse of PIVOT: wide → long. Spark's `unpivot` is a pure
    // projection + generate (one row out per value column), no shuffle —
    // the only shuffle below belongs to the aggregate that builds the wide
    // frame. NULL cells are dropped on both sides (DuckDB's UNPIVOT
    // excludes them by construction; Spark retains them, so the explicit
    // filter keeps the two engines in lockstep on sparse matrices).
    Q("q_unpivot",
      (s, dir) => {
        val wide = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(
            (floor((sum(when(col("o_orderstatus") === "F", col("o_totalprice")))) * 1e4 + 0.5) / 1e4).as("f"),
            (floor((sum(when(col("o_orderstatus") === "O", col("o_totalprice")))) * 1e4 + 0.5) / 1e4).as("o"),
            (floor((sum(when(col("o_orderstatus") === "P", col("o_totalprice")))) * 1e4 + 0.5) / 1e4).as("p"))
        wide.unpivot(
            Array(col("o_orderpriority").as("priority")),
            Array(col("f"), col("o"), col("p")),
            "status", "total")
          .filter(col("total").isNotNull)
          .orderBy(col("priority"), col("status"))
      },
      Some("""SELECT o_orderpriority AS priority, status, total FROM (
             |  SELECT o_orderpriority,
             |         floor((sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)) * 1e4 + 0.5) / 1e4 AS f,
             |         floor((sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END)) * 1e4 + 0.5) / 1e4 AS o,
             |         floor((sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END)) * 1e4 + 0.5) / 1e4 AS p
             |  FROM orders GROUP BY 1)
             |UNPIVOT (total FOR status IN (f, o, p))
             |ORDER BY priority, status""".stripMargin)),

    // ---- FILTER-clause aggregates + multi-distinct ----------------------
    //
    // Conditional aggregation without self-joins: each FILTER rides the
    // same partial+final hash aggregate (one scan, one shuffle) — the
    // pattern that replaces "N scans for N segments" dashboards at 100 TB.
    // count(DISTINCT a), count(DISTINCT b) in one query plans as Spark's
    // expand-based multi-distinct: still a single scan.
    Q("q_agg_filter",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
            (floor((sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")))) * 1e4 + 0.5) / 1e4).as("urgent_total"),
            (floor((avg(when(col("o_totalprice") <= 200000, col("o_totalprice")))) * 1e4 + 0.5) / 1e4).as("avg_small"),
            countDistinct(col("o_orderpriority")).as("n_prio"),
            countDistinct(col("o_custkey")).as("n_cust"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             |       count(*) AS n,
             |       count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
             |       floor((sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT')) * 1e4 + 0.5) / 1e4 AS urgent_total,
             |       floor((avg(o_totalprice) FILTER (WHERE o_totalprice <= 200000)) * 1e4 + 0.5) / 1e4 AS avg_small,
             |       count(DISTINCT o_orderpriority) AS n_prio,
             |       count(DISTINCT o_custkey) AS n_cust
             |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)),

    // ---- correlated EXISTS / NOT EXISTS ---------------------------------
    //
    // Goes through spark.sql so Catalyst's subquery rewrite runs: both
    // EXISTS predicates decorrelate to semi/anti hash joins on c_custkey —
    // never a per-row subquery execution. (The DataFrame semi/anti gates
    // pin the join form; this pins the SQL-subquery path to the same plan.)
    Q("q_exists_subquery",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_qx")
        Tables.customer(s, dir).createOrReplaceTempView("customer_qx")
        s.sql("""SELECT c_custkey, c_mktsegment FROM customer_qx c
                |WHERE EXISTS (SELECT 1 FROM orders_qx o
                |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
                |  AND NOT EXISTS (SELECT 1 FROM orders_qx o
                |                  WHERE o.o_custkey = c.c_custkey
                |                    AND o.o_orderpriority = '1-URGENT')
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // ---- scalar + correlated scalar subqueries --------------------------
    //
    // The uncorrelated scalar (global avg) becomes a broadcast one-row
    // frame; the correlated scalar (per-customer max) decorrelates to an
    // aggregate + equi-join. Both are single-scan shapes, no per-row
    // re-execution.
    Q("q_scalar_subquery",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_qs")
        s.sql("""SELECT o_orderkey,
                |       floor((o_totalprice / (SELECT avg(o_totalprice) FROM orders_qs)) * 1e4 + 0.5) / 1e4 AS vs_avg,
                |       CASE WHEN o_totalprice = (SELECT max(o2.o_totalprice) FROM orders_qs o2
                |                                 WHERE o2.o_custkey = o1.o_custkey)
                |            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_cust_max
                |FROM orders_qs o1
                |WHERE o_totalprice > 400000
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |       floor((o_totalprice / (SELECT avg(o_totalprice) FROM orders)) * 1e4 + 0.5) / 1e4 AS vs_avg,
             |       CASE WHEN o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
             |                                 WHERE o2.o_custkey = o1.o_custkey)
             |            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_cust_max
             |FROM orders o1
             |WHERE o_totalprice > 400000
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- LISTAGG / string_agg -------------------------------------------
    //
    // Order-sensitive string aggregation per group. collect_list is
    // per-group-bounded state — fine for dimension-sized groups like this
    // (high-balance customers per nation); an unbounded-group listagg at
    // 100 TB must be top-N-truncated first (q_topk shape) — the sort
    // inside the group (array_sort) is what makes the result
    // deterministic under Spark's unordered shuffle delivery.
    Q("q_listagg",
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
        val n = Tables.nation(s, dir)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_cust"),
            array_join(array_sort(collect_list(col("c_name"))), ",").as("names"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, count(*) AS n_cust,
             |       string_agg(c_name, ',' ORDER BY c_name) AS names
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > 9000
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ---- MODE / MEDIAN ---------------------------------------------------
    //
    // Exact mode and interpolated median per group — one partial+final
    // aggregate. mode's tie-break is engine-defined, so the gate uses a
    // column whose frequency ranking is strictly monotone (l_linenumber:
    // line 1 exists in every order, 7 only in 7-line orders); median is
    // the exact percentile path (50th, linear interpolation) — at 100 TB
    // the approx twin is percentile_approx (q_ts_percentile_approx shape).
    Q("q_mode_median",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(mode(col("l_linenumber")).cast("long").as("mode_line"),
            (floor(median(col("l_quantity")) * 1e4 + 0.5) / 1e4).as("median_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, CAST(mode(l_linenumber) AS BIGINT) AS mode_line,
             |       floor(median(l_quantity) * 1e4 + 0.5) / 1e4 AS median_qty,
             |       count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ---- correlation / covariance aggregates ----------------------------
    //
    // Pearson corr, sample/population covariance, sample stddev per group
    // — all single-pass partial+final (Welford-style merge states), the
    // same shape as avg/sum, so they scale identically.
    Q("q_corr_stats",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            (floor(corr(col("l_quantity"), col("l_extendedprice")) * 1e4 + 0.5) / 1e4).as("r"),
            (floor(covar_samp(col("l_quantity"), col("l_discount")) * 1e6 + 0.5) / 1e6).as("cov_s"),
            (floor(covar_pop(col("l_quantity"), col("l_discount")) * 1e6 + 0.5) / 1e6).as("cov_p"),
            (floor(stddev_samp(col("l_quantity")) * 1e4 + 0.5) / 1e4).as("sd_qty"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |       floor(corr(l_quantity, l_extendedprice) * 1e4 + 0.5) / 1e4 AS r,
             |       floor(covar_samp(l_quantity, l_discount) * 1e6 + 0.5) / 1e6 AS cov_s,
             |       floor(covar_pop(l_quantity, l_discount) * 1e6 + 0.5) / 1e6 AS cov_p,
             |       floor(stddev_samp(l_quantity) * 1e4 + 0.5) / 1e4 AS sd_qty
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ---- FULL OUTER join -------------------------------------------------
    //
    // Reconciliation shape: high-value customers (acctbal > 8000) full
    // outer high-value orders (totalprice > 450000) per custkey — rows
    // surviving on either side only, null-coalesced. Shuffle hash join on
    // the key; a full outer can never broadcast (both sides must see
    // unmatched rows), which is exactly why it's worth a gate.
    Q("q_join_full_outer",
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_acctbal") > 8000)
          .groupBy(col("c_custkey")).agg(
            (floor(max(col("c_acctbal")) * 1e4 + 0.5) / 1e4).as("acctbal"))
        val o = Tables.orders(s, dir).filter(col("o_totalprice") > 450000)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"),
            (floor(sum(col("o_totalprice")) * 1e4 + 0.5) / 1e4).as("big_total"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("acctbal"), coalesce(col("n_big"), lit(0L)).as("n_big"),
            col("big_total"))
          .orderBy(col("custkey"))
      },
      Some("""WITH c AS (
             |  SELECT c_custkey, floor(max(c_acctbal) * 1e4 + 0.5) / 1e4 AS acctbal
             |  FROM customer WHERE c_acctbal > 8000 GROUP BY 1),
             |o AS (
             |  SELECT o_custkey, count(*) AS n_big,
             |         floor(sum(o_totalprice) * 1e4 + 0.5) / 1e4 AS big_total
             |  FROM orders WHERE o_totalprice > 450000 GROUP BY 1)
             |SELECT coalesce(c_custkey, o_custkey) AS custkey, acctbal,
             |       coalesce(n_big, 0) AS n_big, big_total
             |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
             |ORDER BY custkey""".stripMargin),
      benchExtra = true),

    // ---- Benford first-digit conformance --------------------------------
    //
    // First-significant-digit distribution of l_extendedprice vs Benford's
    // law — the classic fabricated-data screen. The digit is taken from
    // the STRING form (first nonzero character): both engines print the
    // shortest decimal representation of the same double, whose leading
    // digits are identical — a log10/pow10 float path could flip at
    // power-of-ten boundaries. One digit-sized aggregate; chi² contribs
    // per digit, expected share broadcast as a scalar subquery.
    Q("q_dq_benford",
      (s, dir) => {
        val d = Tables.lineitem(s, dir)
          .select(regexp_extract(col("l_extendedprice").cast("string"),
            "[1-9]", 0).as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        val tot = d.agg(sum(col("n")).as("total"))
        d.crossJoin(broadcast(tot))
          .select(col("digit"), col("n"),
            (floor(col("total") * log(10.0, lit(1.0) + lit(1.0) /
              col("digit").cast("double")) * 1e4 + 0.5) / 1e4).as("exp_n"))
          .withColumn("contrib", floor(
            pow(col("n") - col("exp_n"), 2) / col("exp_n") * 1e4 + 0.5) / 1e4)
          .orderBy(col("digit"))
      },
      Some("""WITH d AS (
             |  SELECT regexp_extract(CAST(l_extendedprice AS VARCHAR), '[1-9]') AS digit,
             |         count(*) AS n
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT sum(n) AS total FROM d),
             |e AS (
             |  SELECT digit, n,
             |         floor(total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS exp_n
             |  FROM d CROSS JOIN t)
             |SELECT digit, n, exp_n,
             |       floor(pow(n - exp_n, 2) / exp_n * 1e4 + 0.5) / 1e4 AS contrib
             |FROM e ORDER BY digit""".stripMargin),
      benchExtra = true),

    // Declarative constraint suite (the Deequ-style pre-training data
    // contract): every aggregate-expressible check against a table fuses
    // into ONE shared scan (three lineitem checks = one pass, two orders
    // checks = one pass); referential integrity is a LeftSemi count.
    // Mixed pass/fail thresholds on purpose — the gate pins both
    // verdicts. Metrics are exact-count ratios pre-rounded 1e-6.
    Q("q_dq_suite",
      (s, dir) => {
        import graft.pipeline.Checks
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        Checks.tableSuite(li, "lineitem", Seq(
            Checks.completeness("l_quantity"),
            Checks.inRange("l_discount", 0.0, 0.05),
            Checks.inRange("l_quantity", 1.0, 50.0)))
          .unionByName(Checks.tableSuite(o, "orders", Seq(
            Checks.uniqueness("o_orderkey"),
            Checks.uniqueness("o_orderpriority"))))
          .unionByName(Checks.referential(li, "lineitem", "l_orderkey",
            o, "orders", "o_orderkey"))
          .unionByName(Checks.referential(o, "orders", "o_custkey",
            c, "customer", "c_custkey"))
          .orderBy(col("check"), col("target"))
      },
      Some("""SELECT "check", target, metric, CAST(threshold AS DOUBLE) AS threshold,
             |       metric >= threshold AS pass
             |FROM (
             |  SELECT 'completeness' AS "check", 'lineitem.l_quantity' AS target,
             |         floor(avg(CASE WHEN l_quantity IS NOT NULL THEN 1.0 ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS metric,
             |         1.0 AS threshold
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'in_range', 'lineitem.l_discount',
             |         floor(avg(CASE WHEN l_discount IS NOT NULL AND l_discount >= 0.0 AND l_discount <= 0.05
             |                        THEN 1.0 ELSE 0.0 END) * 1e6 + 0.5) / 1e6, 1.0
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'in_range', 'lineitem.l_quantity',
             |         floor(avg(CASE WHEN l_quantity IS NOT NULL AND l_quantity >= 1.0 AND l_quantity <= 50.0
             |                        THEN 1.0 ELSE 0.0 END) * 1e6 + 0.5) / 1e6, 1.0
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'uniqueness', 'orders.o_orderkey',
             |         floor(count(DISTINCT o_orderkey) * 1.0 / count(*) * 1e6 + 0.5) / 1e6, 1.0
             |  FROM orders
             |  UNION ALL
             |  SELECT 'uniqueness', 'orders.o_orderpriority',
             |         floor(count(DISTINCT o_orderpriority) * 1.0 / count(*) * 1e6 + 0.5) / 1e6, 1.0
             |  FROM orders
             |  UNION ALL
             |  SELECT 'referential', 'lineitem.l_orderkey -> orders.o_orderkey',
             |         floor((SELECT count(*) * 1.0 FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders))
             |               / (SELECT count(*) * 1.0 FROM lineitem) * 1e6 + 0.5) / 1e6, 1.0
             |  UNION ALL
             |  SELECT 'referential', 'orders.o_custkey -> customer.c_custkey',
             |         floor((SELECT count(*) * 1.0 FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer))
             |               / (SELECT count(*) * 1.0 FROM orders) * 1e6 + 0.5) / 1e6, 1.0
             |) ORDER BY "check", target""".stripMargin),
      benchExtra = true),

    // Join-key skew diagnostic — the "will this join/groupBy fall over at
    // 100 TB" pre-flight over three keys of very different shape: a fact
    // FK (l_orderkey, near-uniform), a dimension FK (o_custkey), and a
    // low-cardinality enum (event_type — the pathological groupBy key).
    // One hash aggregate to the key-count frame per column + a
    // TakeOrdered(10); exact-count ratios pre-rounded 1e-6.
    Q("q_dq_skew",
      (s, dir) => {
        import graft.pipeline.Checks
        Checks.keySkew(Tables.lineitem(s, dir), "lineitem", "l_orderkey")
          .unionByName(Checks.keySkew(Tables.orders(s, dir), "orders", "o_custkey"))
          .unionByName(Checks.keySkew(Tables.events(s, dir), "events", "event_type"))
          .orderBy("target")
      },
      Some {
        def block(cte: String, target: String) =
          s"""SELECT '$target' AS target,
             |       CAST(sum(c) AS BIGINT) AS n_rows,
             |       CAST(count(*) AS BIGINT) AS n_keys,
             |       floor(max(c) * 1.0 / sum(c) * 1e6 + 0.5) / 1e6 AS top1_share,
             |       floor(least((SELECT sum(c) * 1.0 FROM (SELECT c FROM $cte ORDER BY c DESC, k ASC LIMIT 10)), sum(c) * 1.0) / sum(c) * 1e6 + 0.5) / 1e6 AS top10_share,
             |       floor(max(c) * 1.0 / (sum(c) * 1.0 / count(*)) * 1e6 + 0.5) / 1e6 AS max_avg_ratio
             |FROM $cte""".stripMargin
        s"""WITH c1 AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
           |     c2 AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
           |     c3 AS (SELECT event_type AS k, count(*) AS c FROM events GROUP BY 1)
           |SELECT * FROM (
           |${block("c3", "events.event_type")}
           |UNION ALL
           |${block("c1", "lineitem.l_orderkey")}
           |UNION ALL
           |${block("c2", "orders.o_custkey")}
           |) ORDER BY target""".stripMargin
      },
      benchExtra = true),

    // Join-size pre-flight (Checks.joinEstimate): exact output
    // cardinality + hottest-key share of three joins of very different
    // shape — fact⋈dim (lineitem⋈orders on orderkey), fact⋈fact self
    // (lineitem⋈lineitem on partkey — the co-purchase blowup), and the
    // pathological enum key (events⋈events on event_type). Cost: per-key
    // count frames only; never runs the joins. top1_share is the "salt
    // this join" trigger.
    Q("q_dq_join_estimate",
      (s, dir) => {
        import graft.pipeline.Checks
        val li = Tables.lineitem(s, dir)
        Checks.joinEstimate(li, "l_orderkey", Tables.orders(s, dir), "o_orderkey",
            "lineitem*orders/orderkey")
          .unionByName(Checks.joinEstimate(li, "l_partkey", li, "l_partkey",
            "lineitem*lineitem/partkey"))
          .unionByName(Checks.joinEstimate(Tables.events(s, dir), "event_type",
            Tables.events(s, dir), "event_type", "events*events/event_type"))
          .orderBy("target")
      },
      Some {
        def block(l: String, lk: String, r: String, rk: String, target: String) =
          s"""SELECT '$target' AS target, CAST(sum(cl * cr) AS BIGINT) AS est_rows,
             |  CAST(count(*) AS BIGINT) AS n_match_keys,
             |  CAST(max(cl * cr) AS BIGINT) AS top1_rows,
             |  floor(max(cl * cr) * 1.0 / sum(cl * cr) * 1e6 + 0.5) / 1e6 AS top1_share
             |FROM (SELECT $lk AS k, count(*) AS cl FROM $l GROUP BY 1) a
             |JOIN (SELECT $rk AS k, count(*) AS cr FROM $r GROUP BY 1) b USING (k)""".stripMargin
        s"""SELECT * FROM (
           |${block("events", "event_type", "events", "event_type", "events*events/event_type")}
           |UNION ALL
           |${block("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem*orders/orderkey")}
           |UNION ALL
           |${block("lineitem", "l_partkey", "lineitem", "l_partkey", "lineitem*lineitem/partkey")}
           |) ORDER BY target""".stripMargin
      },
      benchExtra = true),

    // Equi-depth histograms (Checks.histogram) over two columns of very
    // different shape: a continuous price (near-uniform 8 bins) and a
    // low-cardinality integer quantity (ties collapse bins — the
    // diagnostic working as intended). Boundaries are exact percentiles
    // pre-rounded 1e-6; bin = count of boundaries ≤ value via one
    // codegen array filter against a broadcast one-row boundary frame.
    Q("q_dq_histogram",
      (s, dir) => {
        import graft.pipeline.Checks
        // per-column route: at gate scale the scans are CPU-bound and two
        // cheap codegen passes beat histogramMulti's explode (measured
        // 3.5 vs 5.1 s family-cold); the one-scan multi route is the
        // storage-bound 100 TB choice — PipelineSpec pins both equal
        Checks.histogram(Tables.lineitem(s, dir), "lineitem", "l_extendedprice")
          .unionByName(Checks.histogram(Tables.lineitem(s, dir), "lineitem", "l_quantity"))
          .orderBy("target", "bin")
      },
      Some {
        def block(colName: String) = {
          val ps = (1 until 8).map(i =>
            s"floor(quantile_cont($colName, ${i / 8.0}) * 1e6 + 0.5) / 1e6")
          s"""SELECT 'lineitem.$colName' AS target, bin,
             |       CASE WHEN bin >= 1 THEN bl[CAST(bin AS INT)] END AS lo,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT CAST(len(list_filter(bl, x -> x <= $colName)) AS BIGINT) AS bin, bl
             |      FROM lineitem CROSS JOIN (SELECT [${ps.mkString(", ")}] AS bl FROM lineitem))
             |GROUP BY 1, 2, bl""".stripMargin
        }
        s"""SELECT target, bin, lo, n FROM (
           |${block("l_extendedprice")}
           |UNION ALL
           |${block("l_quantity")}
           |) ORDER BY target, bin""".stripMargin
      },
      benchExtra = true),

    // ---- calendar arithmetic --------------------------------------------
    //
    // date_trunc / add_months (end-of-month clamping) / datediff /
    // last_day / quarter on the shipdate axis — pure row-level projection
    // under the pinned UTC session zone, emitted as formatted strings so
    // no engine's timestamp printing is in the hash path.
    Q("q_date_arith",
      (s, dir) =>
        Tables.lineitem(s, dir).filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"),
            date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM-dd").as("month_start"),
            date_format(add_months(col("l_shipdate"), 3), "yyyy-MM-dd").as("plus3m"),
            datediff(col("l_shipdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
            date_format(last_day(col("l_shipdate")), "yyyy-MM-dd").as("eom"),
            quarter(col("l_shipdate")).cast("long").as("qtr"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |       strftime(l_shipdate, '%Y-%m-%d') AS ship,
             |       strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS month_start,
             |       strftime(l_shipdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
             |       CAST(datediff('day', DATE '1995-01-01', l_shipdate) AS BIGINT) AS days_since,
             |       strftime(last_day(l_shipdate), '%Y-%m-%d') AS eom,
             |       CAST(quarter(l_shipdate) AS BIGINT) AS qtr
             |FROM lineitem WHERE l_orderkey < 100
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- string scalar functions ----------------------------------------
    //
    // upper/lower/substr/replace/lpad/reverse/instr over customer names —
    // the scalar string surface, row-level, scan-riding.
    Q("q_string_fns",
      (s, dir) =>
        Tables.customer(s, dir).filter(col("c_custkey") < 200)
          .select(col("c_custkey"),
            upper(col("c_name")).as("up"),
            lower(col("c_mktsegment")).as("lo"),
            substring(col("c_name"), 10, 5).as("sub"),
            regexp_replace(col("c_name"), lit("Customer"), lit("Cust")).as("repl"),
            lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
            reverse(col("c_name")).as("rev"),
            length(col("c_name")).cast("long").as("len"),
            instr(col("c_name"), "000").cast("long").as("pos"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
             |       upper(c_name) AS up,
             |       lower(c_mktsegment) AS lo,
             |       substr(c_name, 10, 5) AS sub,
             |       replace(c_name, 'Customer', 'Cust') AS repl,
             |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
             |       reverse(c_name) AS rev,
             |       CAST(length(c_name) AS BIGINT) AS len,
             |       CAST(strpos(c_name, '000') AS BIGINT) AS pos
             |FROM customer WHERE c_custkey < 200
             |ORDER BY c_custkey""".stripMargin)),

    // ---- window navigation: first/last/nth_value ------------------------
    //
    // Full-frame navigation per customer order history (o_orderkey order):
    // first, last, and 2nd order price — the SQL:2011 navigation family
    // on one shared unbounded frame (one WindowExec, one sort).
    Q("q_window_nav",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, dir).filter(col("o_custkey") < 200)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            first(col("o_totalprice")).over(w).as("first_price"),
            last(col("o_totalprice")).over(w).as("last_price"),
            nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |       first_value(o_totalprice) OVER w AS first_price,
             |       last_value(o_totalprice) OVER w AS last_price,
             |       nth_value(o_totalprice, 2) OVER w AS second_price
             |FROM orders WHERE o_custkey < 200
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin))
  )
}
