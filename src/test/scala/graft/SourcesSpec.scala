package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{CsvSource, JsonlSource, OrcSource, ParquetSource}
import graft.model.Tables

/** Text-format corpus sources (JSONL / CSV): explicit-schema reads (no
  * inference scan), round-trip fidelity against the parquet truth, and
  * malformed-row tolerance — what a 100 TB ingest actually needs.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  test("JSONL source round-trips the documents table exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "lang", "source", "n_chars", "text")
    docs.write.json(s"$dir/documents.jsonl")
    val back = JsonlSource(dir, docSchema).load(spark, "documents")
      .select("doc_id", "lang", "source", "n_chars", "text")
    assert(back.as[(Long, String, String, Long, String)].collect().toSet ==
      docs.as[(Long, String, String, Long, String)].collect().toSet)
  }

  test("JSONL PERMISSIVE mode survives malformed lines; FAILFAST rejects") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "documents.jsonl"),
      """{"doc_id": 1, "lang": "en", "source": "s", "n_chars": 5, "text": "hello"}
        |not json at all
        |{"doc_id": 2, "lang": "de", "source": "s", "n_chars": 4, "text": "welt"}
        |""".stripMargin)
    val ok = JsonlSource(dir, docSchema).load(spark, "documents")
    assert(ok.filter(col("doc_id").isNotNull).count() == 2)
    val strict = JsonlSource(dir, docSchema, mode = "FAILFAST")
      .load(spark, "documents")
    intercept[org.apache.spark.SparkException] { strict.collect() }
  }

  test("CSV source round-trips a header file with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val rows = Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "fr", 30L))
      .toDF("doc_id", "lang", "n_chars")
    rows.write.option("header", "true").csv(s"$dir/docs.csv")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = CsvSource(dir, schema).load(spark, "docs")
    assert(back.as[(Long, String, Long)].collect().toSet ==
      rows.as[(Long, String, Long)].collect().toSet)
  }

  test("the archiver runs unchanged over a JSONL source (TableSource seam)") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_seam").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_seam_out")
      .toString + "/arch"
    Seq((1L, "2024-01-10 08:00:00", "d1", 1.0),
        (2L, "2024-03-10 08:00:00", "d1", 2.0)) // post-cutoff: retained
      .toDF("id", "ts_str", "device_id", "value")
      .select(col("id"), to_timestamp(col("ts_str")).as("timestamp"),
        col("device_id"), col("value"))
      .write.json(s"$srcDir/iot_data.jsonl")
    val iotSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("timestamp", TimestampType),
      StructField("device_id", StringType),
      StructField("value", DoubleType)))
    val cfg = ArchiverMain.parseConfig(Map(
      "GRAFT_SOURCE_DIR" -> srcDir, "GRAFT_OUT" -> outDir,
      "GRAFT_TABLES" -> "iot_data",
      "GRAFT_CUTOFF" -> "2024-02-01 00:00:00"))
    val r = ArchiverMain.run(spark, cfg, JsonlSource(srcDir, iotSchema), None)
    assert(r.extracted == 1 && r.appended == 1)
    assert(spark.read.parquet(outDir).select("id").as[Long].collect().toSeq
      == Seq(1L))
  }

  test("ORC source round-trips the documents table and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val docs = graft.model.Tables.documents(spark, TestSpark.Sf0001)
    docs.write.mode("overwrite").orc(s"$dir/documents.orc")
    val back = OrcSource(dir).load(spark, "documents")
    assert(back.count() == docs.count())
    assert(back.schema == docs.schema)
    // same content (doc_id is a unique key)
    assert(back.select("doc_id").except(docs.select("doc_id")).count() == 0)
    // predicate reaches the ORC scan
    val plan = back.filter(col("doc_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(doc_id,7)"), s"no pushdown in:\n$plan")
  }
}
