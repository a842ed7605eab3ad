package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Archive

/** A non-`file:` Hadoop filesystem scheme backed by the local FS — the
  * closest an offline sandbox gets to an object store: writes and reads
  * addressed as `mockobj:/...` resolve through `fs.<scheme>.impl`
  * lookup, `Path.getFileSystem`, and the committer machinery exactly
  * the way `s3a://` does (the reference uploads with a buffered
  * PutObject instead, main.go:211-242). Top-level class: Hadoop
  * instantiates it reflectively by name.
  */
class MockObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockobj"
  override def getUri: java.net.URI = java.net.URI.create("mockobj:///")
}

/** Unit + property coverage of the [REF] archival operators
  * (SURVEY.md §5.2-5.3): cutoff boundary, empty-input short-circuit,
  * union stamping, top-k = sorted prefix, per-row partition derivation
  * across a month boundary, archival partition invariants.
  */
class ArchiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def iotDf(rows: Seq[(Long, String, String, Double)]) =
    rows.toDF("id", "ts_str", "device_id", "value")
      .select(col("id"), to_timestamp(col("ts_str")).as("timestamp"),
        col("device_id"), col("value"))

  private val sample = iotDf(Seq(
    (1L, "2024-01-31 23:59:59", "d1", 1.0),
    (2L, "2024-02-01 00:00:00", "d1", 2.0), // exactly at cutoff
    (3L, "2024-02-01 00:00:01", "d2", 3.0),
    (4L, "2023-12-15 12:00:00", "d2", 4.0)))

  test("retention filter is strict < (reference main.go:91 boundary)") {
    val out = sample.transform(Archive.retentionFilter("timestamp", "2024-02-01 00:00:00"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("empty extraction short-circuits to zero rows (main.go:189-192)") {
    val out = sample.transform(Archive.retentionFilter("timestamp", "2000-01-01 00:00:00"))
    assert(out.isEmpty)
  }

  test("top-k newest equals sorted-prefix semantics (main.go:88-93)") {
    val out = sample.transform(Archive.topKNewest("timestamp", "id", 2))
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(3L, 2L))
  }

  test("union stamps distinct table_name per source (main.go:114,180-187)") {
    val a = sample.transform(Archive.stampTableName("t_a"))
    val b = sample.transform(Archive.stampTableName("t_b"))
    val u = Archive.unionAll(Seq(a, b))
    assert(u.count() == 8)
    assert(u.groupBy("table_name").count().as[(String, Long)].collect().toMap ==
      Map("t_a" -> 4L, "t_b" -> 4L))
  }

  test("per-row partition derivation splits a month-spanning batch " +
      "(fixes main.go:195-200 single-partition placement)") {
    val parts = sample.transform(Archive.withTimePartitions("timestamp"))
      .select("year", "month").distinct().as[(Int, Int)].collect().toSet
    assert(parts == Set((2024, 1), (2024, 2), (2023, 12)))
  }

  test("epoch-nanos shape is µs*1000 (main.go:39 with documented truncation)") {
    val ns = sample.transform(Archive.toArchiveShape("timestamp"))
      .select("timestamp").as[Long].collect()
    assert(ns.forall(_ % 1000L == 0L))
    val expect = java.time.LocalDateTime.parse("2024-01-31T23:59:59")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    assert(ns.contains(expect))
  }

  test("archive pipeline invariants: archived ∪ retained = all, disjoint, " +
      "every archived ts < cutoff") {
    val cutoff = "2024-02-01 00:00:00"
    val archived = Archive.archivePipeline(
      Seq("t" -> sample), "timestamp", "id", cutoff, 10)
    val archIds = archived.select("id").as[Long].collect().toSet
    val allIds = sample.select("id").as[Long].collect().toSet
    val retained = allIds -- archIds
    assert(archIds.subsetOf(allIds))
    assert((archIds ++ retained) == allIds && (archIds & retained).isEmpty)
    val maxArchived = archived.agg(max("timestamp")).as[java.sql.Timestamp].head()
    assert(maxArchived.before(java.sql.Timestamp.valueOf(cutoff)))
  }

  test("archive reads prune partitions: a year/month filter becomes " +
      "PartitionFilters, not a data filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Archive.writeArchive(
      sample.transform(Archive.withTimePartitions("timestamp")), dir)
    val q = spark.read.parquet(dir)
      .filter(col("year") === 2024 && col("month") === 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("(year#") && plan.contains("(month#"), plan)
    assert(q.count() == 2)
  }

  test("idempotent append: crash-rerun writes no duplicates, new rows land") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idem").toString + "/arch"
    val batch1 = sample.transform(Archive.stampTableName("t"))
    // first run archives everything
    assert(Archive.appendIdempotent(batch1, dir) == 4)
    // crash-rerun of the SAME batch (reference would duplicate): no-op
    assert(Archive.appendIdempotent(batch1, dir) == 0)
    assert(spark.read.parquet(dir).count() == 4)
    // overlapping batch: only the genuinely new row lands
    val batch2 = iotDf(Seq(
      (3L, "2024-02-01 00:00:01", "d2", 3.0),   // already archived
      (9L, "2024-02-02 08:00:00", "d9", 9.0)))  // new
      .transform(Archive.stampTableName("t"))
    assert(Archive.appendIdempotent(batch2, dir) == 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 5)
    assert(back.groupBy("id").count().filter(col("count") > 1).isEmpty)
  }

  test("archive write and idempotent append run end-to-end through a " +
      "non-file FS scheme (object-store stand-in for the s3a path)") {
    // S3 itself cannot exist in this environment; what CAN be proven is
    // that every archive path goes through the Hadoop FS abstraction —
    // scheme resolution, FileSystem.listStatus, the output committer —
    // with a scheme that is NOT file:. s3a slots into exactly this seam.
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mockobj.impl", classOf[MockObjectStoreFs].getName)
    val local = java.nio.file.Files.createTempDirectory("graft_mockobj")
      .toString
    val uri = "mockobj:" + local + "/arch"
    Archive.writeArchive(
      sample.transform(Archive.withTimePartitions("timestamp")), uri)
    assert(spark.read.parquet(uri).count() == 4)
    // hive layout listed through the SCHEME'd filesystem, not java.io
    val p = new org.apache.hadoop.fs.Path(uri)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val years = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("year=")).sorted
    assert(years.toSeq == Seq("year=2023", "year=2024"))
    // crash-rerun idempotence holds across the scheme too (the
    // anti-join's pruned archive read + append both resolve mockobj:)
    val stamped = sample.transform(Archive.stampTableName("t"))
    val uri2 = "mockobj:" + local + "/arch2"
    assert(Archive.appendIdempotent(stamped, uri2) == 4)
    assert(Archive.appendIdempotent(stamped, uri2) == 0)
    assert(spark.read.parquet(uri2).count() == 4)
  }

  test("writeArchive produces hive year=/month= layout, snappy parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_arch").toString
    val df = sample.transform(Archive.withTimePartitions("timestamp"))
    Archive.writeArchive(df, dir)
    val sub = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("year=")).sorted
    assert(sub.toSeq == Seq("year=2023", "year=2024"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 4)
    assert(back.columns.toSet.contains("month"))
  }

  test("partition checksums: order-independent, round-trip-stable, " +
      "and sensitive to a single mutated row") {
    import graft.ops.Scalar
    def canon = Seq(col("id"), col("device_id"),
      Scalar.epochNanos(col("timestamp")), col("value").cast("decimal(18,6)"))
    def sums(df: org.apache.spark.sql.DataFrame) =
      Archive.partitionChecksums(df, "timestamp", canon)
        .orderBy("year", "month")
        .select("year", "month", "n_rows", "checksum")
        .as[(Int, Int, Long, Long)].collect().toSeq
    val src = sums(sample)
    assert(src.map(t => (t._1, t._2)).toSet ==
      Set((2023, 12), (2024, 1), (2024, 2))) // groups span months
    // archive round-trip (different row order, different partitioning)
    val dir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    Archive.writeArchive(
      sample.transform(Archive.withTimePartitions("timestamp")), dir)
    val back = spark.read.parquet(dir)
      .select("id", "timestamp", "device_id", "value")
      .orderBy(col("value").desc).repartition(3)
    assert(sums(back) == src, "archive read-back digest differs from source")
    // a single flipped value in one partition must change exactly
    // that partition's digest
    val mutated = sample.withColumn("value",
      when(col("id") === 3L, 999.0).otherwise(col("value")))
    val mut = sums(mutated)
    assert(mut.size == src.size)
    val diffs = src.zip(mut).filter { case (a, b) => a != b }
    assert(diffs.map(_._1).map(t => (t._1, t._2)) == Seq((2024, 2)),
      s"expected only 2024-02 to differ, got $diffs")
  }

  test("compaction merges per-run small files and leaves every " +
      "partition digest bit-identical") {
    import graft.ops.Scalar
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
      .toString + "/arch"
    // three appends of disjoint batches = ≥3 files in the partitions
    // they share (the reference's one-file-per-run accumulation)
    (0 until 3).foreach { i =>
      val batch = iotDf(Seq(
        (i * 10 + 1L, "2024-01-15 10:00:00", s"d$i", i + 0.5),
        (i * 10 + 2L, "2024-02-20 11:00:00", s"d$i", i + 1.5)))
        .transform(Archive.stampTableName("t"))
      Archive.appendIdempotent(batch, dir): Unit
    }
    val canon = Seq(col("table_name"), col("id"), col("device_id"),
      Scalar.epochNanos(col("timestamp")), col("value").cast("decimal(18,6)"))
    def sums() = Archive.groupChecksums(spark.read.parquet(dir),
        Seq("year", "month"), canon)
      .orderBy("year", "month").as[(Int, Int, Long, Long)].collect().toSeq
    def fileCount() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    }
    val pre = sums()
    val preFiles = fileCount()
    assert(preFiles >= 6, s"fixture should accumulate small files, got $preFiles")
    val (nParts, before, after) =
      Archive.compactPartitions(spark, dir, targetMB = 64, canon)
    assert(nParts == 2 && before == preFiles && after == 2,
      s"expected both partitions compacted to 1 file: ($nParts, $before, $after)")
    assert(fileCount() == 2)
    assert(sums() == pre, "compaction changed a partition digest")
    // idempotent: a second pass finds nothing to do
    assert(Archive.compactPartitions(spark, dir, targetMB = 64, canon) ==
      ((0, 2, 2)))
  }

  test("compaction survives a partition of all-empty files (bit_xor over " +
      "zero rows is NULL — digest must treat it as 0, not NPE)") {
    import graft.ops.Scalar
    val dir = java.nio.file.Files.createTempDirectory("graft_compact0")
      .toString + "/arch"
    val part = s"$dir/year=2024/month=1"
    new java.io.File(part).mkdirs()
    // three zero-row appends: file count exceeds the 1-file target while
    // every file holds no rows
    val empty = iotDf(Seq((1L, "2024-01-15 10:00:00", "d0", 0.5)))
      .transform(Archive.stampTableName("t")).filter(col("id") < 0L)
      .transform(Archive.withTimePartitions("timestamp"))
      .drop("year", "month")
    (0 until 3).foreach(_ => empty.write.mode("append").parquet(part))
    val canon = Seq(col("table_name"), col("id"), col("device_id"),
      Scalar.epochNanos(col("timestamp")), col("value").cast("decimal(18,6)"))
    val (nParts, before, after) =
      Archive.compactPartitions(spark, dir, targetMB = 64, canon)
    assert(nParts == 1 && before == 3 && after == 1, s"($nParts, $before, $after)")
    assert(spark.read.parquet(dir).isEmpty)
  }

  test("compaction crash recovery: a mid-swap crash rolls back to the " +
      "exact originals, a completed-swap leftover backup rolls forward") {
    import graft.ops.Scalar
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_crash")
      .toString + "/arch"
    (0 until 3).foreach { i =>
      Archive.appendIdempotent(iotDf(Seq(
        (i * 10 + 1L, "2024-01-15 10:00:00", s"d$i", i + 0.5)))
        .transform(Archive.stampTableName("t")), dir): Unit
    }
    val canon = Seq(col("table_name"), col("id"), col("device_id"),
      Scalar.epochNanos(col("timestamp")), col("value").cast("decimal(18,6)"))
    def digestAll() = Archive.groupChecksums(spark.read.parquet(dir),
        Seq("year", "month"), canon)
      .orderBy("year", "month").as[(Int, Int, Long, Long)].collect().toSeq
    val pre = digestAll()
    val fs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val part = new Path(dir, "year=2024/month=1")
    val tmp = new Path(part.getParent, ".month=1.compact_tmp")
    val bak = new Path(part.getParent, ".month=1.compact_bak")
    def parquetFiles(p: Path) = fs.listStatus(p).filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    def writeManifest(names: Seq[String]): Unit = {
      val o = fs.create(new Path(bak, "_MANIFEST"), true)
      try o.write(names.mkString("\n").getBytes("UTF-8")) finally o.close()
    }
    // --- scenario A: crash AFTER originals moved to backup, BEFORE any
    // swap-in (partition momentarily empty — the worst case: a naive
    // rerun would see nothing to compact and delete the only copy)
    val originals = parquetFiles(part).map(_.getPath.getName).toSeq
    spark.read.parquet(part.toString).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(bak)
    writeManifest(parquetFiles(tmp).map(_.getPath.getName).toSeq)
    originals.foreach(n =>
      assert(fs.rename(new Path(part, n), new Path(bak, n))))
    assert(parquetFiles(part).isEmpty) // the dangerous window
    val (n1, b1, a1) = Archive.compactPartitions(spark, dir, 64, canon)
    assert(n1 == 1 && b1 == 3 && a1 == 1, s"($n1, $b1, $a1)")
    assert(digestAll() == pre, "rollback+recompact changed the digest")
    assert(!fs.exists(tmp) && !fs.exists(bak))
    // --- scenario B: crash AFTER the swap completed but BEFORE the
    // backup was dropped (partition holds the verified rewrite; the
    // backup must be discarded, not restored — restoring would
    // duplicate every row)
    val rewriteName = parquetFiles(part).head.getPath.getName
    fs.mkdirs(bak)
    writeManifest(Seq(rewriteName))
    // stale original content in the backup (same rows, pre-compaction)
    val scratch = new Path(part.getParent, ".scratch")
    spark.read.parquet(part.toString).coalesce(1)
      .write.mode("overwrite").parquet(scratch.toString)
    parquetFiles(scratch).foreach(f =>
      assert(fs.rename(f.getPath, new Path(bak, "old_" + f.getPath.getName))))
    fs.delete(scratch, true)
    val (n2, b2, a2) = Archive.compactPartitions(spark, dir, 64, canon)
    assert(n2 == 0 && b2 == 1 && a2 == 1, s"($n2, $b2, $a2)")
    assert(digestAll() == pre, "roll-forward changed the digest")
    assert(!fs.exists(bak))
  }

  test("checksum canonical encoding is injective: NULL position shifts " +
      "and delimiter bytes inside values cannot collide two rows") {
    def digest(rows: Seq[(String, String, String)]): Long =
      Archive.groupChecksums(
        rows.toDF("a", "b", "c").withColumn("g", lit(1)),
        Seq("g"), Seq(col("a"), col("b"), col("c")))
        .select("checksum").as[Long].head()
    // (a, NULL, b) vs (a, b, NULL): a concat_ws canon renders both "a|b"
    assert(digest(Seq(("a", null, "b"))) != digest(Seq(("a", "b", null))))
    // a '|' INSIDE a value vs at a field boundary: both "a|b|c" under
    // concat_ws; the length-prefixed encoding keeps them distinct
    assert(digest(Seq(("a|b", "c", "x"))) != digest(Seq(("a", "b|c", "x"))))
    // adjacent-field content shift: ("ab","c") vs ("a","bc")
    assert(digest(Seq(("ab", "c", "x"))) != digest(Seq(("a", "bc", "x"))))
    // and equal rows still digest equal (sanity)
    assert(digest(Seq(("a", "b", "c"))) == digest(Seq(("a", "b", "c"))))
  }

  test("schema evolution: a mergeSchema read over epochs written before " +
      "and after a column was added fills the missing column with NULL " +
      "and keeps every row") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_schema_evo_spec").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .write.mode("overwrite").parquet(dir + "/e1")
    Seq((3L, "c", 7.5), (4L, "d", 2.5)).toDF("id", "k", "v")
      .write.mode("overwrite").parquet(dir + "/e2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(dir + "/e1", dir + "/e2")
    assert(merged.columns.sorted.toSeq == Seq("id", "k", "v"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), r.isNullAt(2))).toSeq
    assert(rows == Seq((1L, true), (2L, true), (3L, false), (4L, false)),
      rows.toString)
  }
}
