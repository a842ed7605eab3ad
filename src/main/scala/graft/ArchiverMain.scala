package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}
import graft.io.{JdbcRetention, JdbcSource, ParquetSource, TableSource}
import graft.ops.Archive

/** The runnable end-to-end archiver — the reference's entire operational
  * surface (`run()`, reference main.go:147-256) as one Spark job:
  *
  *   config → per-table extract → archive batch → idempotent append →
  *   keyed retention DELETE
  *
  * Same contract as the reference (point it at a database and it
  * archives), with the round-1 survey's three fixes baked in:
  *
  *   - the delete set is keyed to the rows actually archived, not the
  *     reference's wider `timestamp < cutoff` predicate that destroys
  *     rows the LIMITed extract never saved (main.go:131-145);
  *   - re-running after a crash between write and delete appends zero
  *     duplicate rows ([[Archive.appendIdempotent]] — the reference
  *     re-uploads the whole batch, main.go:211-242);
  *   - a batch spanning months lands in per-row `year=/month=`
  *     partitions, not one partition chosen from the max timestamp
  *     (main.go:220-223).
  *
  * Error semantics match the reference: ANY table failing aborts the
  * whole run before anything is written (main.go:183-185), and `main`
  * exits 1 with the error on stderr (main.go:259-264).
  *
  * Config is environment-first like the reference (main.go:149-153,
  * 272-277), `KEY=value` args override env:
  *
  *   GRAFT_SOURCE_DIR   parquet stand-in dir (table t ↦ dir/t.parquet)
  *   GRAFT_JDBC_URL     OR a live JDBC url (reference PG_CONN_STRING)
  *   GRAFT_JDBC_USER / GRAFT_JDBC_PASSWORD / GRAFT_JDBC_DRIVER
  *   GRAFT_TABLES       comma-separated (reference TABLE_NAMES)
  *   GRAFT_OUT          archive root: file:///… or s3a://bucket/prefix
  *                      (reference S3_BUCKET; same code path either way)
  *   GRAFT_CUTOFF       'yyyy-MM-dd HH:mm:ss' — explicit, deterministic
  *   GRAFT_RETENTION_DAYS  else now−N days (reference retentionDays=90)
  *   GRAFT_BATCH_SIZE   per-table top-k (reference batchSize=100)
  *   GRAFT_DELETE       'true' → run the retention DELETE (JDBC only)
  *   GRAFT_VERIFY       'true' → re-read the archive and require batch
  *                      digests to match before any DELETE
  *                      (Archive.groupChecksums)
  *   GRAFT_MASTER       spark master, default local[*]
  */
object ArchiverMain {

  final case class Config(
      sourceDir: Option[String],
      jdbcUrl: Option[String],
      jdbcProps: java.util.Properties,
      tables: Seq[String],
      outPath: String,
      cutoff: String,
      batchSize: Int,
      deleteFromSource: Boolean,
      streaming: Boolean = false,
      checkpointDir: Option[String] = None,
      verifyArchive: Boolean = false) {
    require(sourceDir.isDefined ^ jdbcUrl.isDefined,
      "exactly one of GRAFT_SOURCE_DIR / GRAFT_JDBC_URL must be set")
    require(tables.nonEmpty, "GRAFT_TABLES must name at least one table")
    require(!streaming || sourceDir.isDefined,
      "GRAFT_STREAMING needs a file source (GRAFT_SOURCE_DIR)")
  }

  final case class RunReport(
      extracted: Long, appended: Long, deleted: Map[String, Long])

  /** Env-first config, `KEY=value` args override (reference getEnv,
    * main.go:272-277). Defaults mirror the reference's (batch 100,
    * retention 90 d).
    */
  def parseConfig(env: Map[String, String], args: Array[String] = Array.empty): Config = {
    val overrides = args.iterator.map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"args must be KEY=value, got: $a")
      a.substring(0, i) -> a.substring(i + 1)
    }.toMap
    def get(k: String): Option[String] = overrides.get(k).orElse(env.get(k))
    val props = new java.util.Properties()
    get("GRAFT_JDBC_USER").foreach(props.setProperty("user", _))
    get("GRAFT_JDBC_PASSWORD").foreach(props.setProperty("password", _))
    get("GRAFT_JDBC_DRIVER").foreach(props.setProperty("driver", _))
    val cutoff = get("GRAFT_CUTOFF").getOrElse {
      val days = get("GRAFT_RETENTION_DAYS").map(_.toInt).getOrElse(90)
      java.time.LocalDateTime.now(java.time.ZoneOffset.UTC).minusDays(days)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    }
    Config(
      sourceDir = get("GRAFT_SOURCE_DIR"),
      jdbcUrl = get("GRAFT_JDBC_URL"),
      jdbcProps = props,
      tables = get("GRAFT_TABLES").getOrElse("iot_data").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq,
      outPath = get("GRAFT_OUT")
        .getOrElse(sys.error("GRAFT_OUT (archive path) is required")),
      cutoff = cutoff,
      batchSize = get("GRAFT_BATCH_SIZE").map(_.toInt).getOrElse(100),
      deleteFromSource = get("GRAFT_DELETE").exists(_.toBoolean),
      streaming = get("GRAFT_STREAMING").exists(_.toBoolean),
      verifyArchive = get("GRAFT_VERIFY").exists(_.toBoolean),
      checkpointDir = get("GRAFT_CHECKPOINT"))
  }

  private def sourceFor(cfg: Config): TableSource = cfg.sourceDir match {
    case Some(dir) => ParquetSource(dir)
    case None      => JdbcSource(cfg.jdbcUrl.get, cfg.jdbcProps)
  }

  /** Continuous mode (`GRAFT_STREAMING=true`): the same archival as an
    * incremental exactly-once streaming job — new source files are
    * picked up by checkpointed file streams and appended through the
    * keyed idempotent sink, so neither checkpoint replay nor total
    * checkpoint LOSS can duplicate a row. The reference lists
    * "real-time archival" as future work (reference README.md:124);
    * this is it, sharing every operator with the batch path. No top-k
    * cap here: streaming bounds per-trigger work with
    * maxFilesPerTrigger instead of the cron model's batch LIMIT; no
    * retention DELETE either (run batch mode for that) — the streaming
    * contract is append-only archival.
    */
  def runStreaming(spark: SparkSession, cfg: Config): RunReport = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.streaming.Trigger
    val iotSchema = StructType(Seq(
      StructField("id", LongType), StructField("timestamp", TimestampType),
      StructField("device_id", StringType), StructField("value", DoubleType)))
    var appended = 0L
    var extracted = 0L
    cfg.tables.foreach { t =>
      val ckpt = cfg.checkpointDir.map(c => s"$c/$t").getOrElse(
        java.nio.file.Files.createTempDirectory(s"graft_ckpt_$t").toString)
      val stream = spark.readStream.schema(iotSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"${cfg.sourceDir.get}/$t.parquet")
        .transform(Archive.retentionFilter("timestamp", cfg.cutoff))
        .transform(Archive.stampTableName(t))
      val q = stream.writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          extracted += b.count()
          appended += Archive.appendIdempotent(b.toDF(), cfg.outPath)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    println(s"Streaming archival: $appended new rows (of $extracted extracted) to ${cfg.outPath}")
    RunReport(extracted, appended, Map.empty)
  }

  /** One archival run. Injectable source + connection factory keep the
    * whole loop testable without a live PostgreSQL; `main` wires the
    * production implementations of both.
    */
  def run(spark: SparkSession, cfg: Config,
      source: TableSource,
      connect: Option[() => java.sql.Connection]): RunReport = {
    if (cfg.streaming) return runStreaming(spark, cfg)
    // Per-table extract, abort-on-first-error (main.go:183-185). Schema
    // resolution is eager, so a missing table / bad connection fails
    // HERE — before anything is written.
    val perTable: Seq[(String, DataFrame)] = cfg.tables.map { t =>
      val df =
        try {
          val loaded = source.load(spark, t).transform(Archive.projectIot)
          // canonical archive schema regardless of source-identifier
          // case (JDBC servers often uppercase unquoted names)
          loaded.toDF("id", "timestamp", "device_id", "value")
        } catch {
          case e: Exception =>
            throw new RuntimeException(s"processing table $t: ${e.getMessage}", e)
        }
      t -> df
    }

    // filter(ts<cutoff) → per-table top-k → stamp → union → per-row
    // year/month. One declarative plan; persisted because three actions
    // consume it (count, idempotent append, delete-range derivation).
    val batch = Archive.archivePipeline(
      perTable, "timestamp", "id", cfg.cutoff, cfg.batchSize).persist()
    try {
      val extracted = batch.count()
      if (extracted == 0L) {
        println("No records to archive")
        return RunReport(0L, 0L, Map.empty)
      }

      // Reference row shape: timestamp as epoch-nanos int64
      // (main.go:36-44); year/month were derived above while the column
      // was still timestamp-typed.
      val appended = Archive.appendIdempotent(
        batch.transform(Archive.toArchiveShape("timestamp")), cfg.outPath)
      println(s"Archived $appended new rows (batch of $extracted) to ${cfg.outPath}")

      // Verify-before-delete (GRAFT_VERIFY): re-read the archive and
      // compare per-(year, month) digests of THIS batch's rows against
      // what we just tried to make durable — the read-back check the
      // reference never does before destroying source data. Order- and
      // partitioning-independent by construction.
      if (cfg.verifyArchive) {
        val canon = Seq(col("table_name"), col("id"), col("device_id"),
          col("timestamp"), col("value").cast("decimal(18,6)"))
        val want = Archive.groupChecksums(
          batch.transform(Archive.toArchiveShape("timestamp")),
          Seq("year", "month"), canon)
        val keys = batch.select(col("table_name"), col("id"))
        // Prune the read-back to the batch's year/month partitions (same
        // predicate appendIdempotent pushes): verification cost follows
        // batch size, not total archive size.
        val got = Archive.groupChecksums(
          spark.read.parquet(cfg.outPath)
            .filter(Archive.timePartitionFilter(batch))
            .join(keys, Seq("table_name", "id"), "left_semi"),
          Seq("year", "month"), canon)
        val mismatch = want.except(got).count() + got.except(want).count()
        require(mismatch == 0L,
          s"archive verification FAILED: $mismatch partition digests " +
            "differ between the batch and the read-back archive — " +
            "refusing to delete source rows")
        println("Archive verified: read-back digests match the batch")
      }

      // Retention DELETE keyed to the batch — which is exactly the rows
      // now durable in the archive: freshly appended ones plus any a
      // previously-crashed run wrote but failed to delete.
      val deleted = connect match {
        case Some(c) if cfg.deleteFromSource =>
          val d = JdbcRetention.deleteArchived(
            batch.select("table_name", "id"), cfg.tables.toSet, c)
          d.foreach { case (t, n) => println(s"Deleted $n records from table $t") }
          d
        case _ => Map.empty[String, Long]
      }
      RunReport(extracted, appended, deleted)
    } finally batch.unpersist()
  }

  /** Maintenance mode (`GRAFT_DIFF_A=<dir> GRAFT_DIFF_B=<dir>`): diff
    * two archive generations keyed on (table_name, id) via
    * [[Archive.snapshotDiff]] and report added/removed/changed counts —
    * the audit for the reference's crash window (a run dying between
    * upload and delete re-archives rows silently, main.go:211-251).
    * Composite key = `table_name * 2^40 + id`-style concat is avoided:
    * we diff per table (the archive discriminator column), so the key
    * stays the natural `id`. Returns per-table status counts; nothing
    * is written.
    */
  def runDiff(spark: SparkSession, dirA: String, dirB: String):
      Map[(String, String), Long] = {
    val a = spark.read.parquet(dirA)
    val b = spark.read.parquet(dirB)
    val tables = (a.select("table_name").distinct().collect() ++
      b.select("table_name").distinct().collect())
      .map(_.getString(0)).distinct.sorted
    val compare = Seq("timestamp", "device_id", "value")
    tables.flatMap { t =>
      Archive.snapshotDiff(
          a.filter(col("table_name") === t),
          b.filter(col("table_name") === t), "id", compare)
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
        .collect().map(r => (t, r.getString(0)) -> r.getLong(1))
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    // Diff mode triggers on explicit CLI args ONLY — a stale
    // GRAFT_DIFF_A/B pair inherited from a scheduler's environment must
    // not silently turn a production archival run into a read-only diff
    // with exit 0 (ADVICE r10). Values may still come from env once the
    // MODE is arg-selected (arg `GRAFT_DIFF_A` alone + env `GRAFT_DIFF_B`
    // works), but env alone never selects it.
    val argCfg = args.flatMap(a => a.split("=", 2) match {
      case Array(k, v) => Some(k -> v); case _ => None
    }).toMap
    val cfg0 = sys.env ++ argCfg
    if (argCfg.contains("GRAFT_DIFF_A") || argCfg.contains("GRAFT_DIFF_B")) {
      require(cfg0.contains("GRAFT_DIFF_A") && cfg0.contains("GRAFT_DIFF_B"),
        "diff mode needs BOTH GRAFT_DIFF_A and GRAFT_DIFF_B")
      println("Archive diff mode: read-only — nothing will be archived " +
        "or deleted")
      val spark = SparkSession.builder()
        .master(cfg0.getOrElse("GRAFT_MASTER", "local[*]"))
        .appName("graft-archiver-diff")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      try {
        val counts = runDiff(spark, cfg0("GRAFT_DIFF_A"), cfg0("GRAFT_DIFF_B"))
        if (counts.isEmpty) println("Archive diff: generations are identical")
        else counts.toSeq.sorted.foreach { case ((t, s), n) =>
          println(s"Archive diff: $t $s $n")
        }
      } finally spark.stop()
      return
    }
    val cfg = parseConfig(sys.env, args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
      .appName("graft-archiver")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val connect = cfg.jdbcUrl.map(url =>
        () => java.sql.DriverManager.getConnection(url, cfg.jdbcProps))
      val report = run(spark, cfg, sourceFor(cfg), connect)
      println(s"Successfully archived ${report.extracted} total records " +
        s"(${report.appended} new) to ${cfg.outPath}")
    } catch {
      case e: Exception =>
        System.err.println(s"error: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
