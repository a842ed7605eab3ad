package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.Scalar.{dsum, davg}

/** Relational completion (SURVEY.md §2.3-2.8, §7 step 3): joins over the
  * star schema, grouped aggregations, rollup/cube, window functions,
  * set operations, sorts/limits, scalar + JSON functions, plus the
  * batch twins of the streaming surface (§2.10 — tumbling windows,
  * sessionization, as-of correlation).
  *
  * Scale notes: small dimensions are `broadcast()` so the fact-side
  * join never shuffles; double aggregates go through DECIMAL
  * (order-independent — see graft.ops.Scalar) for oracle determinism.
  */
object RelationalQueries {

  private val EventsCte =
    """WITH e AS (SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |  user_id, event_type, value, props FROM events)""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A3: grouped aggregation (TPC-H Q1 shape) — two-phase hash agg,
    // partial map-side combine is automatic.
    "q1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          davg(col("l_quantity"), 2).as("avg_qty"),
          davg(col("l_extendedprice"), 2).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // 2.3 equi-join chain (TPC-H Q3 shape): broadcast dim → fact,
    // revenue top-10 via TakeOrderedAndProject. Join-then-aggregate is
    // kept, unlike q18 below: an eager-aggregation variant (lineitem
    // pre-aggregated below the join) measured at PARITY at sf0.1 (r8,
    // 0.6-0.8 s steady both) — the selective o/c filters mean
    // pre-aggregation pays full aggregate cost on the ~90% of orders
    // the join discards, and on a randomly-partitioned lineitem the
    // map-side partial combine only shaved ~20% of shuffled rows.
    // Revisit only for an orderkey-clustered layout, where partial
    // combine collapses each order to one row per map partition.
    "q3_top_orders" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q10 shape (returned-item reporting, adapted to the
    // fixture's slimmer customer schema): quarter-filtered orders join
    // R-flagged lineitems, customers + nations attach as broadcasts,
    // top-20 customers by lost revenue. The orderdate filter pushes to
    // the orders scan, the returnflag filter to lineitem; revenue sums
    // in DECIMAL (exact in any partitioning), top-k fuses to
    // TakeOrderedAndProject.
    "q10_returned_items" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape: a group-HAVING subquery (large orders) feeds the
    // 3-table rollup. The HAVING sum runs in DECIMAL so the > threshold
    // compare is exact on both engines. One lineitem pass (r8): the
    // output grouping (c_name, c_custkey, o_orderkey, o_orderdate,
    // o_totalprice) is order-granular — o_orderkey functionally
    // determines every other group column — so total_qty per group IS
    // the per-order qty the HAVING filter already computed. The
    // textbook plan re-joins lineitem and re-aggregates; reusing the
    // HAVING aggregate removes the second lineitem scan, the o⋈l
    // shuffle join, and the final grouping shuffle, and shrinks the
    // o-side join to the few HAVING survivors (AQE broadcasts them).
    "q18_large_orders" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
        .filter(col("qty") > 250)
      o.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("qty").cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
        .orderBy(col("o_orderkey"))
    }),

    // 2.3 five-way star join (TPC-H Q5 shape): all dims broadcast —
    // the fact table is scanned once, zero shuffle until the final agg.
    "q5_nation_revenue" -> ((s, d) => {
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
      val sup = Tables.supplier(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q4 shape (order-priority checking): the EXISTS decorrelates
    // to a left-semi join whose condition is compound — equi on the
    // order key PLUS the correlated range predicate (late shipment:
    // l_shipdate > o_orderdate + 90 days), the decorrelation shape
    // q_join_semi's key-only EXISTS doesn't exercise. The quarter
    // filter pushes to the orders scan; the semi join never widens
    // orders (each order emits at most once regardless of how many
    // late lineitems match).
    "q4_order_priority" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q16 shape (parts/supplier relationship, adapted: the
    // fixture has no partsupp, so lineitem IS the part↔supplier
    // relation, and no s_comment, so "complaint" suppliers are the
    // negative-balance ones): NOT IN decorrelates to a left-anti join
    // against a broadcast-sized exclusion list (s_suppkey is non-null,
    // so anti ≡ NOT IN), then a distinct aggregate per part attribute.
    // The selective part filter joins FIRST (broadcast) so the anti
    // join scans only surviving lineitems; countDistinct expands to the
    // standard two-shuffle (key-distinct, then count) plan.
    "q16_parts_suppliers" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q14 shape (promotion effect): the conditional-aggregate
    // ratio — CASE-gated DECIMAL revenue over total DECIMAL revenue in
    // one pass, part dim broadcast, month filter pushed to the
    // lineitem scan. The ratio divides two exact decimals cast to
    // double, so the quotient is engine-identical.
    "q14_promo_effect" -> ((s, d) => {
      val p = Tables.part(s, d)
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-02-01 00:00:00").cast("timestamp"))
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev)).cast("double") /
            sum(rev).cast("double")).as("promo_revenue_pct"),
          sum(when(col("p_type") === "PROMO", rev)).cast("double")
            .as("promo_revenue"),
          sum(rev).cast("double").as("total_revenue"))
    }),

    // 2.3 left outer join: per-order lineitem rollup keeping all orders.
    "q_join_left" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("o_orderkey"))
        .agg(count(col("l_orderkey")).as("n_items"),
          coalesce(dsum(col("l_quantity"), 2), lit(0.0)).as("total_qty"))
        .orderBy(col("o_orderkey"))
    }),

    // 2.3 left-semi (EXISTS): orders having a heavy lineitem.
    "q_join_semi" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val heavy = Tables.lineitem(s, d).filter(col("l_quantity") > 45.0)
      o.join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // 2.3 left-anti (NOT EXISTS): customers with no 1995 orders.
    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o95 = Tables.orders(s, d).filter(year(col("o_orderdate")) === 1995)
      c.join(o95, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // A5 rollup: hierarchical subtotals.
    "q_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // A5 cube: all grouping-set combinations.
    "q_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // A4 distinct counts (exact; approx_count_distinct is covered by
    // q_approx_distinct in ExtQueries with a rows-only check).
    "q_distinct_counts" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))),

    // O1-O3: global top-n — TakeOrderedAndProject, not a full sort.
    "q_topn_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // 2.5 ranking window: top-3 orders per customer.
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // 2.5 analytic window (lag): inter-event gaps per user, exact µs.
    "q_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("gap_us")).as("total_gap_us"))
        .orderBy(col("user_id"))
    }),

    // 2.5 frame-spec window: 7-row moving average (decimal-exact).
    "q_window_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-6, 0)
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("mavg",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double") /
            count(lit(1)).over(w))
        .orderBy(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"))
    }),

    // skew-salted equi-join (round 11): the explicit-salting machinery
    // ScaleSpec measures, now under the oracle gate — semantics must
    // equal the plain inner join exactly (the salt key spreads a hot
    // orderkey over 4 reducer tasks; the build side explodes ×4 — salt
    // 8→4 in r13 halves the exploded build at identical semantics, a
    // bench-budget call; ScaleSpec still proves the 8-bucket shape)
    "q_join_salted" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.ops.Scale.saltedJoin(l, o, "l_orderkey", "o_orderkey", 4)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity"), 2).as("total_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // 2.5 RANGE-frame window on event time (round 11): trailing-hour
    // count + decimal-exact sum per event — the time-based frame spec
    // the ROWS-frame q_window_moving_avg can't express (a RANGE frame
    // admits variable row counts and includes ALL timestamp ties, so
    // the result is well-defined without a tie column). Integer-µs
    // bounds keep the frame arithmetic exact on both engines.
    "q_trailing_window" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("value"))
        // one select → both frame aggregates share ONE Window node
        // (separate withColumns interleave a Project and split them)
        .select(col("event_id"), col("event_type"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("sum_1h"))
        .orderBy(col("event_id"))
    }),

    // U2 intersect: customers ordering in both years.
    "q_set_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      y95.intersect(y96).orderBy(col("o_custkey"))
    }),

    // U2 except: customers with orders, minus those ordering in 1995.
    "q_set_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.select(col("o_custkey"))
        .except(o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    // F1/F2/F4/F5: string split, date arithmetic, formatting,
    // interpolation (reference main.go:156-159,177,220-225).
    "q_scalar_funcs" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          split(col("o_orderpriority"), "-").getItem(0).cast("int").as("prio_num"),
          (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("ship_by"),
          date_format(col("o_orderdate"), "yyyyMMdd_HHmmss").as("key_stamp"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          concat_ws("|", col("o_orderstatus"), col("o_orderkey")).as("tag"))
        .orderBy(col("o_orderkey"))
        .limit(1000)),

    // F7: JSON access on events.props.
    "q_json_props" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // 2.10 batch twin of tumbling-window streaming agg.
    "q_window_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("bucket_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 4).as("val_sum"))
        .orderBy(col("bucket_start"), col("event_type"))),

    // 2.10 sessionization (30-min inactivity gap) via window functions.
    "q_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // 2.3 range/interval join: lineitems shipped within 120 days of
    // their order date — equi key + range predicate, so Catalyst plans
    // a hash/sort-merge join on the key with the range as a post-filter
    // (NOT a nested loop).
    "q_range_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 120 DAYS"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("qty"))
        .orderBy(col("o_orderstatus"))
    }),

    // 2.3 as-of join: each purchase ↔ most recent prior signup of the
    // same user. Window-based (one shuffle by user), not a nested-loop —
    // the 100 TB-safe formulation; ties (equal ts) count the signup.
    "q_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), when(col("event_type") === "purchase", 1).otherwise(0),
          col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.withColumn("signup_ts",
          when(col("event_type") === "signup", col("ts")))
        .withColumn("last_signup_ts", last(col("signup_ts"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("last_signup_ts"))
        .orderBy(col("event_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey, o_orderdate,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |SELECT * FROM (
        |  SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderkey IN (SELECT l_orderkey FROM big)
        |  GROUP BY 1, 2, 3, 4, 5
        |  ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100)
        |ORDER BY o_orderkey""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q14_promo_effect" ->
      """SELECT
        |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
        |      CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    END) AS DOUBLE) /
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |      AS DOUBLE) AS promo_revenue_pct,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
        |      CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    END) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q16_parts_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |    WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_join_left" ->
      """SELECT o_orderkey, COUNT(l_orderkey) AS n_items,
        |COALESCE(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_qty
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_join_semi" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_anti" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND year(o_orderdate) = 1995)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_distinct_counts" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
        |COUNT(DISTINCT l_partkey) AS n_parts,
        |COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem""".stripMargin,

    "q_topn_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_lag" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts) // 1000 AS us, user_id FROM events),
        |g AS (SELECT user_id,
        |  us - LAG(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
        |  FROM e)
        |SELECT user_id, COUNT(*) AS n_events,
        |CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_window_moving_avg" ->
      """SELECT o_orderpriority, o_orderdate, o_orderkey, o_totalprice,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |  / (COUNT(*) OVER w) AS mavg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderpriority, o_orderdate, o_orderkey""".stripMargin,

    // the PLAIN inner join: the salted plan must be observationally
    // identical to it
    "q_join_salted" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_trailing_window" ->
      """WITH e AS (SELECT event_id, event_type, epoch_ns(ts) // 1000 AS us,
        |    value FROM events)
        |SELECT event_id, event_type,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,

    "q_set_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |ORDER BY o_custkey""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num,
        |o_orderdate + INTERVAL 90 DAY AS ship_by,
        |strftime(o_orderdate, '%Y%m%d_%H%M%S') AS key_stamp,
        |CAST(year(o_orderdate) AS INT) AS y,
        |CAST(month(o_orderdate) AS INT) AS m,
        |o_orderstatus || '|' || CAST(o_orderkey AS VARCHAR) AS tag
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin,

    "q_json_props" ->
      """WITH e AS (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        |MIN(k) AS min_k, MAX(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_window_tumbling" ->
      s"""$EventsCte SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
         |event_type, COUNT(*) AS n,
         |CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS val_sum
         |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts) // 1000 AS us, user_id FROM events),
        |g AS (SELECT user_id, us,
        |  LAG(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
        |  FROM e),
        |f AS (SELECT user_id,
        |  CASE WHEN prev_us IS NULL OR us - prev_us > 30*60*1000000 THEN 1 ELSE 0 END AS ns
        |  FROM g)
        |SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_range_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 120 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_asof_join" ->
      s"""$EventsCte SELECT p.event_id, p.user_id, p.ts,
         |(SELECT MAX(su.ts) FROM e su WHERE su.user_id = p.user_id
         |  AND su.event_type = 'signup' AND su.ts <= p.ts) AS last_signup_ts
         |FROM e p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin
  )
}
