package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.model.FixtureCheck

/** The r8 incident regression guard: the driver regenerated testdata
  * mid-round and `events.ts` silently changed physical type, costing 18
  * queries and 34 tests for a round. This spec (a) fails with a
  * readable, column-naming message if the CURRENT testdata drifts
  * outside the accepted contract again, and (b) proves the canary
  * itself detects drift (red on synthetic drifted schemas — a canary
  * that can't fire is worse than none).
  */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("canary: current testdata matches the fixture schema contract " +
    "(footer-only probe; a failure here means the driver regenerated " +
    "fixtures — read the message, fix the reader or the contract)") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val drift = FixtureCheck.driftAll(spark, sf)
      assert(drift.isEmpty, s"\nFIXTURE DRIFT at $sf:\n  " + drift.mkString("\n  "))
    }
  }

  test("canary fires on a retyped column, naming table.column, the " +
    "arrived dtype, and the accepted set (the r8 events.ts class)") {
    // events with ts as String — the shape of an incompatible regeneration
    val drifted = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", StringType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val msgs = FixtureCheck.drift("events", drifted)
    assert(msgs.size == 1, msgs)
    assert(msgs.head.contains("events.ts") && msgs.head.contains("DRIFTED") &&
      msgs.head.contains("STRING"), msgs.head)
  }

  test("canary accepts every encoding the events reader handles and " +
    "rejects none of them (Long ns | TIMESTAMP | TIMESTAMP_NTZ)") {
    for (dt <- Seq(LongType, TimestampType, TimestampNTZType)) {
      val s = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", dt),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      assert(FixtureCheck.drift("events", s).isEmpty, dt)
    }
  }

  test("canary fires on missing and unexpected columns") {
    val s = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("payload", BinaryType))) // props gone, payload new
    val msgs = FixtureCheck.drift("events", s)
    assert(msgs.exists(m => m.contains("events.props") && m.contains("MISSING")), msgs)
    assert(msgs.exists(m => m.contains("events.payload") && m.contains("UNEXPECTED")), msgs)
  }

  test("mixed-generation lake: one nanos-Long dir + one timestamp[us] " +
    "dir union to twice the rows with BIT-IDENTICAL canonical ts " +
    "values per event (the DEPLOY.md migration path)") {
    import org.apache.spark.sql.functions._
    import graft.model.Tables
    val base = java.nio.file.Files.createTempDirectory("graft_mixed").toString
    // legacy generation: ts as a plain INT64 of epoch nanos on disk
    Tables.eventsRawNanos(spark, TestSpark.Sf0001)
      .write.mode("overwrite").parquet(s"$base/gen_ns/events.parquet")
    // current generation: ts as timestamp[us]/NTZ, untransformed
    Tables.eventsNative(spark, TestSpark.Sf0001)
      .write.mode("overwrite").parquet(s"$base/gen_us/events.parquet")
    assert(Tables.eventsTsIsNanosLong(spark, s"$base/gen_ns"))
    assert(!Tables.eventsTsIsNanosLong(spark, s"$base/gen_us"))
    val u = Tables.eventsUnionAll(spark, Seq(s"$base/gen_ns", s"$base/gen_us"))
    val n = Tables.events(spark, TestSpark.Sf0001).count()
    assert(u.count() == 2 * n)
    // every event_id appears exactly twice with ONE distinct canonical
    // ts — the two encodings canonicalize to identical µs values
    val bad = u.groupBy("event_id")
      .agg(count(lit(1)).as("c"), countDistinct(col("ts")).as("d"))
      .filter(col("c") =!= 2 || col("d") =!= 1)
    assert(bad.isEmpty)
  }

  test("the events readers themselves fail loudly on an unsupported " +
    "ts dtype, naming the column and the accepted encodings") {
    import org.apache.spark.sql.functions._
    import graft.model.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft_badts").toString
    spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    for (read <- Seq(
        () => Tables.events(spark, dir),
        () => Tables.eventsRawNanos(spark, dir))) {
      val e = intercept[IllegalStateException](read())
      assert(e.getMessage.contains("events.ts") &&
        e.getMessage.contains("TIMESTAMP_NTZ"), e.getMessage)
    }
  }

  test("NTZ canonicalization refuses a non-UTC session timezone: the " +
    "two fixture encodings would disagree on epoch values there " +
    "(SURVEY §5.1 determinism contract)") {
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException](
        graft.model.Tables.events(spark, TestSpark.Sf0001))
      assert(e.getMessage.contains("America/New_York") &&
        e.getMessage.contains("UTC"), e.getMessage)
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
    // and UTC spellings that normalize to UTC are all accepted
    for (tz <- Seq("UTC", "Etc/UTC", "Z")) {
      try {
        spark.conf.set("spark.sql.session.timeZone", tz)
        assert(graft.model.Tables.events(spark, TestSpark.Sf0001)
          .schema("ts").dataType.typeName == "timestamp")
      } finally spark.conf.set("spark.sql.session.timeZone", saved)
    }
  }

  test("canary fires red end-to-end on a synthetic drifted PARQUET " +
    "fixture on disk, green on an untouched copy") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_canary").toString
    // untouched: copy the real events fixture through a re-write
    spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .write.mode("overwrite").parquet(s"$dir/ok/events.parquet")
    for (t <- FixtureCheck.expected.keys if t != "events")
      spark.read.parquet(s"${TestSpark.Sf0001}/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/ok/$t.parquet")
    assert(FixtureCheck.driftAll(spark, s"$dir/ok").isEmpty)
    // drifted: ts re-typed to String on disk
    spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/bad/events.parquet")
    for (t <- FixtureCheck.expected.keys if t != "events")
      spark.read.parquet(s"${TestSpark.Sf0001}/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/bad/$t.parquet")
    val drift = FixtureCheck.driftAll(spark, s"$dir/bad")
    assert(drift.size == 1 && drift.head.contains("events.ts"), drift)
  }
}
