package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.Scalar.dsum
import graft.ext.Ranking

/** Reshaping + remaining analytic surface: pivot, ordered array
  * aggregation, dense_rank/ntile/lead, arg-max aggregates, EXCEPT ALL.
  */
object ShapeQueries {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // pivot: one column per event_type (schema fixed by explicit value
    // list — never let pivot scan for values at scale).
    "q_pivot_events" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("day", dayofmonth(col("ts")))
        .groupBy(col("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .orderBy(col("day"))),

    // unpivot (wide → long): the melt that turns lineitem's four
    // numeric measures into (measure, value) rows — the inverse
    // reshape of q_pivot_events. Output stays bounded by the grouped
    // rollup; sums run in exact integer cents (every fixture measure
    // is 2-dp) and divide once at the end, min/max are copies.
    "q_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "v")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("v") * 100, 0).cast("long")).cast("double")
            / 100.0).as("total"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
        .orderBy(col("measure"))),

    // ordered array aggregation (collect_list is unordered by contract;
    // sort_array pins it).
    "q_collect_ordered" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 100)
        .groupBy(col("l_orderkey"))
        .agg(concat_ws(",",
            sort_array(collect_list(col("l_linenumber")))).as("lines"),
          count(lit(1)).as("n"))
        .orderBy(col("l_orderkey"))),

    // dense_rank / ntile / lead in one pass over one window spec.
    "q_window_analytics" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("drk", dense_rank().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .filter(col("drk") <= 20)
        .orderBy(col("o_orderpriority"), col("drk"), col("o_orderkey"))
    }),

    // arg-max/arg-min aggregates (max_by/min_by).
    "q_argmax" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("biggest_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("smallest_order"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
        .orderBy(col("o_orderstatus"))),

    // distribution window functions: percent_rank / cume_dist /
    // first_value over one ordered partition spec.
    "q_window_distribution" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("cheapest", first_value(col("o_orderkey"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("o_orderkey") <= 500)
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    }),

    // set-union with dedup (UNION vs UNION ALL).
    "q_set_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        .union(o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
        .distinct()
        .orderBy(col("o_custkey"))
    }),

    // generator / lateral-view explode (round 11): tokens to rows WITH
    // ordinal position — the flatten every doc-to-token pipeline stage
    // starts from (chunking, span indexing, token-level labels). The
    // generate is row-local (no shuffle at all before the presentation
    // sort); output is bounded by the doc_id predicate, which pushes
    // to the scan.
    "q_explode_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .orderBy(col("doc_id"), col("pos"))),

    // 2-D skyline / Pareto frontier (round 11): parts where no other
    // part is both cheaper and larger — dominance ranking without the
    // naive O(n²) NOT-EXISTS self-join (see Ranking.skyline for the
    // distinct-value running-max shape).
    "q_skyline" -> ((s, d) =>
      Ranking.skyline(Tables.part(s, d),
          col("p_retailprice"), col("p_size"),
          Seq(col("p_partkey"), col("p_brand")))
        .select(col("p_partkey"), col("p_brand"),
          col("cost").as("price"), col("gain").as("sz"))
        .orderBy(col("price"), col("p_partkey"))),

    // multiset difference: EXCEPT ALL keeps duplicate cardinalities.
    "q_set_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.select(col("o_custkey"))
        .exceptAll(o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey")))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_custkey"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_pivot_events" ->
      """WITH e AS (SELECT CAST(day(make_timestamp(epoch_ns(ts) // 1000)) AS INT) AS day,
        |  event_type FROM events)
        |SELECT day,
        |COUNT(*) FILTER (event_type = 'click') AS click,
        |COUNT(*) FILTER (event_type = 'error') AS error,
        |COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |COUNT(*) FILTER (event_type = 'signup') AS signup,
        |COUNT(*) FILTER (event_type = 'view') AS view
        |FROM e GROUP BY day ORDER BY day""".stripMargin,

    "q_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS v FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(v * 100, 0) AS BIGINT)) AS DOUBLE)
        |    / 100.0 AS total,
        |  MIN(v) AS lo, MAX(v) AS hi
        |FROM u GROUP BY measure ORDER BY measure""".stripMargin,

    "q_collect_ordered" ->
      """SELECT l_orderkey,
        |array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS lines,
        |COUNT(*) AS n FROM lineitem WHERE l_orderkey <= 100
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_window_analytics" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(DENSE_RANK() OVER w AS INT) AS drk,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  LEAD(o_totalprice, 1) OVER w AS next_price
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey)) t
        |WHERE drk <= 20
        |ORDER BY o_orderpriority, drk, o_orderkey""".stripMargin,

    "q_argmax" ->
      """WITH r AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rb,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice ASC, o_orderkey ASC) AS rs
        |  FROM orders)
        |SELECT o_orderstatus,
        |MAX(CASE WHEN rb = 1 THEN o_orderkey END) AS biggest_order,
        |MAX(CASE WHEN rs = 1 THEN o_orderkey END) AS smallest_order,
        |MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price
        |FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_window_distribution" ->
      """SELECT * FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  PERCENT_RANK() OVER w AS pr,
        |  CUME_DIST() OVER w AS cd,
        |  FIRST_VALUE(o_orderkey) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cheapest
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey)) t
        |WHERE o_orderkey <= 500
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,

    "q_set_union" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |UNION
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,

    // lockstep unnest = posexplode: DuckDB zips parallel unnests in the
    // same SELECT, so the series unnest IS the ordinal of the token
    // unnest
    "q_explode_tokens" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id,
        |  CAST(unnest(generate_series(0, len(toks) - 1)) AS INT) AS pos,
        |  unnest(toks) AS tok
        |FROM d ORDER BY doc_id, pos""".stripMargin,

    // same distinct-cost running-max construction as Ranking.skyline —
    // pure comparisons, nothing to round
    "q_skyline" ->
      """WITH r AS (SELECT p_partkey, p_brand, p_retailprice AS price,
        |    p_size AS sz FROM part),
        |b AS (SELECT price, MAX(sz) AS gmax FROM r GROUP BY price),
        |f AS (SELECT price, gmax, MAX(gmax) OVER (ORDER BY price
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM b)
        |SELECT r.p_partkey, r.p_brand, r.price, r.sz
        |FROM r JOIN f ON r.price = f.price AND r.sz = f.gmax
        |WHERE f.prevmax IS NULL OR f.prevmax < f.gmax
        |ORDER BY r.price, r.p_partkey""".stripMargin,

    "q_set_except_all" ->
      """WITH x AS (SELECT o_custkey FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
        |SELECT o_custkey, COUNT(*) AS n FROM x
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
  )
}
