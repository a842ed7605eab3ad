package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Scalar-function depth (SURVEY.md §2.8): string manipulation and date
  * arithmetic beyond the reference's own four functions — the surface a
  * user migrating real queries hits first.
  */
object FuncQueries {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_string_funcs" -> ((s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          length(col("c_name")).as("name_len"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
          reverse(col("c_mktsegment")).as("seg_rev"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_translated"))
        .orderBy(col("c_custkey"))
        .limit(1000)),

    "q_date_funcs" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date"))
            .as("days_to_1999"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
          dayofweek(col("o_orderdate")).as("dow"),
          quarter(col("o_orderdate")).as("q"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))
        .limit(1000))
  )

  def oracles: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT c_custkey,
        |upper(c_name) AS name_upper,
        |substring(c_name, 1, 8) AS name_prefix,
        |CAST(length(c_name) AS INT) AS name_len,
        |lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |reverse(c_mktsegment) AS seg_rev,
        |coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS name_digits,
        |translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated
        |FROM customer ORDER BY c_custkey LIMIT 1000""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT)
        |  AS days_to_1999,
        |CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
        |CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |CAST(quarter(o_orderdate) AS INT) AS q,
        |CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin
  )
}
