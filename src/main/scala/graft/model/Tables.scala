package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table loaders for the driver-generated star schema (TESTDATA.md) plus
  * the reference's IoT data model (reference main.go:20-26 — id, timestamp,
  * device_id, value, table_name).
  *
  * All access goes through `spark.read.parquet` so Catalyst's column
  * pruning / predicate pushdown reach the scan. Never collect.
  */
object Tables {

  /** Schema of the reference's in-memory record (reference main.go:20-26).
    * `table_name` is a synthesized discriminator (main.go:25,114).
    */
  val iotSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("timestamp", TimestampType),
    StructField("device_id", StringType),
    StructField("value", DoubleType),
    StructField("table_name", StringType)
  ))

  /** Schema of the reference's Parquet archive row (main.go:28-34):
    * timestamp is epoch NANOS as INT64 (main.go:39). Spark timestamps are
    * µs precision so the nanos column is µs*1000 (zero-padded ns).
    */
  val archiveSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("timestamp", LongType),
    StructField("device_id", StringType),
    StructField("value", DoubleType),
    StructField("table_name", StringType)
  ))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot read
    * natively ([PARQUET_TYPE_ILLEGAL]); read it as a nanos Long via the
    * legacy flag and truncate to Spark's µs timestamp precision
    * (`ts div 1000` — floor, matching DuckDB's ns→µs cast).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Raw events with `ts` as an epoch-nanos Long (for F3-style queries). */
  def eventsRawNanos(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
