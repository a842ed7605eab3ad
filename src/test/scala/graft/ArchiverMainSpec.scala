package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{JdbcSource, ParquetSource}

/** End-to-end archiver integration (the reference's full `run()` loop,
  * main.go:147-256): config → extract → archive → idempotent append →
  * keyed retention DELETE.
  *
  * Two harnesses:
  *   - parquet stand-in source: full loop minus the DELETE, plus the
  *     crash-rerun guarantee (rerunning an interrupted archival appends
  *     zero duplicates);
  *   - embedded Apache Derby over the REAL `spark.read.jdbc` path and a
  *     REAL `java.sql.Connection` for the retention DELETE — the live
  *     JDBC round-trip a PostgreSQL-less sandbox can run. Same wire
  *     contract (DriverManager, PreparedStatement binds) as production.
  */
class ArchiverMainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val Cutoff = "2024-02-01 00:00:00"

  // ---------------------------------------------------------------- config

  test("parseConfig: env-first, KEY=value args override, reference defaults") {
    val cfg = ArchiverMain.parseConfig(
      Map("GRAFT_SOURCE_DIR" -> "/src", "GRAFT_OUT" -> "/out",
        "GRAFT_TABLES" -> "a, b", "GRAFT_CUTOFF" -> Cutoff),
      Array("GRAFT_TABLES=c"))
    assert(cfg.tables == Seq("c")) // arg wins
    assert(cfg.batchSize == 100 && !cfg.deleteFromSource) // reference defaults
    assert(cfg.cutoff == Cutoff)

    intercept[IllegalArgumentException] { // source xor jdbc enforced
      ArchiverMain.parseConfig(Map("GRAFT_OUT" -> "/out"))
    }
    intercept[IllegalArgumentException] {
      ArchiverMain.parseConfig(Map("GRAFT_OUT" -> "/out",
        "GRAFT_SOURCE_DIR" -> "/s", "GRAFT_JDBC_URL" -> "jdbc:x"))
    }
  }

  test("a failing table aborts the whole run before anything is written " +
      "(reference main.go:183-185)") {
    val srcDir = tmp("graft_cli_abort_src")
    val outDir = tmp("graft_cli_abort_out") + "/arch"
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), "d1", 1.0))
      .toDF("id", "timestamp", "device_id", "value")
      .write.parquet(s"$srcDir/good.parquet")
    val cfg = ArchiverMain.parseConfig(Map(
      "GRAFT_SOURCE_DIR" -> srcDir, "GRAFT_OUT" -> outDir,
      "GRAFT_TABLES" -> "good,missing", "GRAFT_CUTOFF" -> Cutoff))
    val e = intercept[RuntimeException] {
      ArchiverMain.run(spark, cfg, ParquetSource(srcDir), None)
    }
    assert(e.getMessage.contains("processing table missing"), e.getMessage)
    assert(!new java.io.File(outDir).exists(), "aborted run must write nothing")
  }

  // ------------------------------------------------- parquet stand-in loop

  test("parquet source end-to-end: batch lands partitioned + nanos-shaped, " +
      "crash-rerun appends zero duplicates") {
    val srcDir = tmp("graft_cli_src")
    val outDir = tmp("graft_cli_out") + "/arch"
    def write(table: String, rows: Seq[(Long, String, String, Double)]): Unit =
      rows.toDF("id", "ts_str", "device_id", "value")
        .select(col("id"), to_timestamp(col("ts_str")).as("timestamp"),
          col("device_id"), col("value"))
        .write.parquet(s"$srcDir/$table.parquet")
    write("iot_data", Seq(
      (1L, "2023-12-30 10:00:00", "d1", 1.0),
      (2L, "2024-01-05 10:00:00", "d1", 2.0),
      (3L, "2024-01-20 10:00:00", "d2", 3.0),
      (4L, "2024-03-01 10:00:00", "d2", 4.0)))  // after cutoff: retained
    write("iot_metrics", Seq(
      (1L, "2024-01-02 00:00:00", "m1", 10.0),
      (2L, "2024-02-02 00:00:00", "m1", 20.0))) // after cutoff: retained

    val cfg = ArchiverMain.parseConfig(Map(
      "GRAFT_SOURCE_DIR" -> srcDir, "GRAFT_OUT" -> outDir,
      "GRAFT_TABLES" -> "iot_data,iot_metrics", "GRAFT_CUTOFF" -> Cutoff,
      "GRAFT_BATCH_SIZE" -> "2"))
    val r1 = ArchiverMain.run(spark, cfg, ParquetSource(srcDir), None)
    // top-2 newest pre-cutoff from iot_data = ids {2,3}; iot_metrics = {1}
    assert(r1.extracted == 3 && r1.appended == 3 && r1.deleted.isEmpty)

    val arch = spark.read.parquet(outDir)
    assert(arch.schema("timestamp").dataType ==
      org.apache.spark.sql.types.LongType) // reference nanos shape
    assert(arch.select("table_name", "id").as[(String, Long)].collect().toSet ==
      Set(("iot_data", 2L), ("iot_data", 3L), ("iot_metrics", 1L)))
    assert(arch.select("year", "month").distinct().as[(Int, Int)].collect().toSet
      == Set((2024, 1))) // per-row partitions

    // crash-rerun (parquet source can't delete, so the same batch comes
    // back): zero new rows, archive unchanged
    val r2 = ArchiverMain.run(spark, cfg, ParquetSource(srcDir), None)
    assert(r2.extracted == 3 && r2.appended == 0)
    assert(spark.read.parquet(outDir).count() == 3)
    assert(spark.read.parquet(outDir)
      .groupBy("table_name", "id").count().filter(col("count") > 1).isEmpty)

    // GRAFT_VERIFY: the read-back digest gate passes on the intact
    // archive...
    val vcfg = cfg.copy(verifyArchive = true)
    val r3 = ArchiverMain.run(spark, vcfg, ParquetSource(srcDir), None)
    assert(r3.extracted == 3 && r3.appended == 0)

    // ...and refuses (throws) once a durable archive row is corrupted
    val goodRows = spark.read.parquet(outDir).collect()
    val schema = spark.read.parquet(outDir).schema
    val corrupted = spark.createDataFrame(
      java.util.Arrays.asList(goodRows.map { r =>
        val i = r.fieldIndex("value")
        val vals = r.toSeq.updated(i, r.getDouble(i) + 1000.0)
        org.apache.spark.sql.Row.fromSeq(vals)
      }: _*), schema)
    val outDir2 = tmp("graft_cli_out2") + "/arch"
    corrupted.write.partitionBy("year", "month").parquet(outDir2)
    val ex = intercept[IllegalArgumentException] {
      ArchiverMain.run(spark, vcfg.copy(outPath = outDir2),
        ParquetSource(srcDir), None)
    }
    assert(ex.getMessage.contains("archive verification FAILED"))
  }

  test("streaming mode archives incrementally, exactly-once across " +
      "checkpoint replay AND checkpoint loss") {
    val srcDir = tmp("graft_cli_stream_src")
    val outDir = tmp("graft_cli_stream_out") + "/arch"
    val ckpt = tmp("graft_cli_stream_ckpt")
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), "d1", 1.0),
        (2L, java.sql.Timestamp.valueOf("2024-01-12 00:00:00"), "d1", 2.0),
        (3L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "d2", 3.0))
      .toDF("id", "timestamp", "device_id", "value")
      .write.parquet(s"$srcDir/iot_data.parquet")

    val base = Map(
      "GRAFT_SOURCE_DIR" -> srcDir, "GRAFT_OUT" -> outDir,
      "GRAFT_TABLES" -> "iot_data", "GRAFT_CUTOFF" -> Cutoff,
      "GRAFT_STREAMING" -> "true", "GRAFT_CHECKPOINT" -> ckpt)
    val r1 = ArchiverMain.run(spark, ArchiverMain.parseConfig(base),
      graft.io.ParquetSource(srcDir), None)
    assert(r1.appended == 2) // id 3 is post-cutoff
    assert(spark.read.parquet(outDir).select("id").as[Long].collect().toSet
      == Set(1L, 2L))

    // new source file arrives → only it is processed (checkpoint keeps
    // the old files from re-reading)
    Seq((4L, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), "d9", 4.0))
      .toDF("id", "timestamp", "device_id", "value")
      .write.mode("append").parquet(s"$srcDir/iot_data.parquet")
    val r2 = ArchiverMain.run(spark, ArchiverMain.parseConfig(base),
      graft.io.ParquetSource(srcDir), None)
    assert(r2.extracted == 1 && r2.appended == 1)

    // total checkpoint loss replays EVERYTHING — the keyed idempotent
    // append still writes zero duplicates
    val r3 = ArchiverMain.run(spark,
      ArchiverMain.parseConfig(base + ("GRAFT_CHECKPOINT" -> tmp("graft_ckpt2"))),
      graft.io.ParquetSource(srcDir), None)
    assert(r3.extracted == 3 && r3.appended == 0)
    val arch = spark.read.parquet(outDir)
    assert(arch.count() == 3)
    assert(arch.groupBy("id").count().filter(col("count") > 1).isEmpty)
  }

  // ------------------------------------------------ live JDBC (Derby) loop

  /** Embedded-Derby fixture: in-memory DB, lowercase-quoted columns
    * (Spark sees the canonical names), uppercase table identifiers (what
    * Derby stores for unquoted DDL — `JdbcRetention`'s quoted DELETE
    * must target the stored case exactly).
    */
  private def derby(db: String): (String, () => java.sql.Connection) = {
    val url = s"jdbc:derby:memory:$db;create=true"
    val connect = () => java.sql.DriverManager.getConnection(url)
    val conn = connect()
    try {
      val st = conn.createStatement()
      for (t <- Seq("IOT_DATA", "IOT_METRICS"))
        st.executeUpdate(s"""CREATE TABLE $t (
          "id" BIGINT PRIMARY KEY, "timestamp" TIMESTAMP,
          "device_id" VARCHAR(32), "value" DOUBLE)""")
      st.close()
    } finally conn.close()
    (url, connect)
  }

  private def insert(connect: () => java.sql.Connection, table: String,
      rows: Seq[(Long, String, String, Double)]): Unit = {
    val conn = connect()
    try {
      val ps = conn.prepareStatement(s"INSERT INTO $table VALUES (?,?,?,?)")
      rows.foreach { case (id, ts, dev, v) =>
        ps.setLong(1, id)
        ps.setTimestamp(2, java.sql.Timestamp.valueOf(ts))
        ps.setString(3, dev); ps.setDouble(4, v)
        ps.executeUpdate()
      }
      ps.close()
    } finally conn.close()
  }

  private def remainingIds(connect: () => java.sql.Connection, table: String): Set[Long] = {
    val conn = connect()
    try {
      val rs = conn.createStatement().executeQuery(s"""SELECT "id" FROM $table""")
      val b = Set.newBuilder[Long]
      while (rs.next()) b += rs.getLong(1)
      b.result()
    } finally conn.close()
  }

  test("JDBC scan pushes filters and prunes columns into the remote " +
      "query (main.go:88-93 delegation, decided at plan time)") {
    val (url, connect) = derby("graft_pushdown")
    insert(connect, "IOT_DATA", Seq(
      (1L, "2024-01-05 08:00:00", "d1", 1.0),
      (2L, "2024-02-05 08:00:00", "d2", 9.0)))
    val df = JdbcSource(url, new java.util.Properties())
      .load(spark, "IOT_DATA")
      .filter(col("timestamp") < to_timestamp(lit(Cutoff)) &&
        col("value") > 0.5)
      .select("id", "timestamp")
    // read the scan node's metadata, not the plan string (toString
    // elides long filter lists to "…")
    val pushed = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec =>
        s.metadata("PushedFilters")
    }
    assert(pushed.size == 1, df.queryExecution.executedPlan.toString)
    // both predicates reach the JDBC relation as pushed filters ('*' =
    // handled entirely by the source) — they execute on the server
    // inside the generated WHERE clause, exactly the delegation
    // io/Sources.scala claims
    assert(pushed.head.contains("*LessThan(timestamp"), pushed.head)
    assert(pushed.head.contains("*GreaterThan(value,0.5"), pushed.head)
    // column pruning reaches the source too: the scan's ReadSchema is
    // exactly the projected columns, and device_id appears nowhere
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint,timestamp:timestamp>"), plan)
    assert(!plan.contains("device_id"), plan)
    assert(df.as[(Long, java.sql.Timestamp)].collect().map(_._1).toSeq
      == Seq(1L))
  }

  test("Derby round-trip: real spark.read.jdbc extract, crash-sim rerun " +
      "appends nothing, keyed DELETE removes exactly the archived ids, " +
      "batched drain empties the backlog") {
    val (url, connect) = derby("graft_e2e")
    val outDir = tmp("graft_cli_jdbc_out") + "/arch"
    insert(connect, "IOT_DATA", Seq(
      (1L, "2023-11-15 08:00:00", "d1", 1.0),
      (2L, "2023-12-20 08:00:00", "d1", 2.0),
      (3L, "2024-01-05 08:00:00", "d2", 3.0),
      (4L, "2024-01-10 08:00:00", "d2", 4.0),
      (5L, "2024-01-25 08:00:00", "d3", 5.0),
      (6L, "2024-01-31 23:59:59", "d3", 6.0),
      (7L, "2024-02-10 08:00:00", "d4", 7.0),   // post-cutoff
      (8L, "2024-03-01 08:00:00", "d4", 8.0)))  // post-cutoff
    insert(connect, "IOT_METRICS", Seq(
      (1L, "2024-01-07 00:00:00", "m1", 10.0),
      (2L, "2024-01-08 00:00:00", "m2", 20.0),
      (3L, "2024-02-08 00:00:00", "m3", 30.0))) // post-cutoff

    val base = Map(
      "GRAFT_JDBC_URL" -> url, "GRAFT_OUT" -> outDir,
      "GRAFT_TABLES" -> "IOT_DATA,IOT_METRICS", "GRAFT_CUTOFF" -> Cutoff,
      "GRAFT_BATCH_SIZE" -> "4")
    val source = JdbcSource(url, new java.util.Properties())

    // run 1 "crashes" after the append, before the DELETE
    val crashed = ArchiverMain.run(spark,
      ArchiverMain.parseConfig(base), source, Some(connect))
    // top-4 newest pre-cutoff of IOT_DATA = {3,4,5,6}; IOT_METRICS = {1,2}
    assert(crashed.extracted == 6 && crashed.appended == 6)
    assert(crashed.deleted.isEmpty) // GRAFT_DELETE unset = crash window
    assert(remainingIds(connect, "IOT_DATA") == (1L to 8L).toSet) // nothing deleted

    // rerun with delete on: same batch re-extracts, ZERO new archive rows
    // (exactly-once), DELETE removes exactly the archived ids
    val r2 = ArchiverMain.run(spark,
      ArchiverMain.parseConfig(base + ("GRAFT_DELETE" -> "true")), source, Some(connect))
    assert(r2.extracted == 6 && r2.appended == 0)
    assert(r2.deleted == Map("IOT_DATA" -> 4L, "IOT_METRICS" -> 2L))
    assert(remainingIds(connect, "IOT_DATA") == Set(1L, 2L, 7L, 8L))
    assert(remainingIds(connect, "IOT_METRICS") == Set(3L))

    // next scheduled run drains the backlog the batch limit left behind
    val r3 = ArchiverMain.run(spark,
      ArchiverMain.parseConfig(base + ("GRAFT_DELETE" -> "true")), source, Some(connect))
    assert(r3.extracted == 2 && r3.appended == 2)
    assert(r3.deleted == Map("IOT_DATA" -> 2L))
    assert(remainingIds(connect, "IOT_DATA") == Set(7L, 8L)) // only post-cutoff left

    // backlog empty: the run is a clean no-op
    val r4 = ArchiverMain.run(spark,
      ArchiverMain.parseConfig(base + ("GRAFT_DELETE" -> "true")), source, Some(connect))
    assert(r4.extracted == 0 && r4.appended == 0 && r4.deleted.isEmpty)

    // archive total: every pre-cutoff row exactly once
    val arch = spark.read.parquet(outDir)
    assert(arch.count() == 8)
    assert(arch.groupBy("table_name", "id").count()
      .filter(col("count") > 1).isEmpty)
    assert(arch.filter(col("table_name") === "IOT_DATA")
      .select("id").as[Long].collect().toSet == (1L to 6L).toSet)
  }

  test("diff maintenance mode: per-table added/removed/changed counts " +
      "between two archive generations; identical generations are clean") {
    def row(t: String, id: Long, ns: Long, dev: String, v: Double) =
      (id, ns, dev, v, t)
    val genA = Seq(
      row("iot_data", 1, 1000L, "d1", 1.0),
      row("iot_data", 2, 2000L, "d2", 2.0),
      row("iot_data", 3, 3000L, "d3", 3.0),
      row("iot_metrics", 9, 9000L, "m1", 9.0)
    ).toDF("id", "timestamp", "device_id", "value", "table_name")
    val genB = Seq(
      row("iot_data", 1, 1000L, "d1", 1.0),    // unchanged
      row("iot_data", 2, 2000L, "d2", 2.5),    // changed (value)
      row("iot_data", 4, 4000L, "d4", 4.0),    // added; id 3 removed
      row("iot_metrics", 9, 9000L, "m1", 9.0)  // unchanged
    ).toDF("id", "timestamp", "device_id", "value", "table_name")
    val (dirA, dirB) = (tmp("graft_diff_a"), tmp("graft_diff_b"))
    genA.write.mode("overwrite").parquet(dirA)
    genB.write.mode("overwrite").parquet(dirB)
    val counts = ArchiverMain.runDiff(spark, dirA, dirB)
    assert(counts == Map(
      ("iot_data", "added") -> 1L,
      ("iot_data", "removed") -> 1L,
      ("iot_data", "changed") -> 1L))
    assert(ArchiverMain.runDiff(spark, dirA, dirA).isEmpty)
  }
}
