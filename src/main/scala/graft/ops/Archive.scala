package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's archival-pipeline capabilities as composable
  * `DataFrame => DataFrame` operators (SURVEY.md §2.1-2.8, §3.1).
  *
  * Reference: johnonline35/pg-archiver `main.go`. Each function cites the
  * behavior it re-expresses; none of the code is a translation — the
  * reference is a single-threaded Go loop, these are declarative Spark
  * plans that Catalyst pushes into the parquet scan.
  */
object Archive {

  /** P1 (main.go:89): fixed 4-column projection. Catalyst turns this into
    * parquet `ReadSchema` pruning — the scan never reads other columns.
    */
  def projectIot(df: DataFrame): DataFrame =
    df.select("id", "timestamp", "device_id", "value")

  /** P2 (main.go:91,177): retention filter `timestamp < cutoff`. The cutoff
    * is a parameter (not `now()`) so verified queries are deterministic.
    * Pushed to the parquet scan as a range predicate (`PushedFilters`).
    */
  def retentionFilter(tsCol: String, cutoff: String)(df: DataFrame): DataFrame =
    df.filter(col(tsCol) < to_timestamp(lit(cutoff)))

  /** P3 (main.go:114): stamp the source-table discriminator column. */
  def stampTableName(name: String)(df: DataFrame): DataFrame =
    df.withColumn("table_name", lit(name))

  /** P4 (main.go:36-44): row-shape conversion to the archive layout —
    * timestamp → epoch nanos INT64. Spark timestamps are µs precision, so
    * ns = µs * 1000 (documented truncation, SURVEY §1.3).
    */
  def toArchiveShape(tsCol: String)(df: DataFrame): DataFrame =
    df.withColumn(tsCol, unix_micros(col(tsCol)) * lit(1000L))

  /** O1+O2+O3 (main.go:88-93): newest-k-rows-older-than-cutoff. Catalyst
    * fuses orderBy+limit into `TakeOrderedAndProject` — a distributed
    * top-k (per-partition heap + driver merge), NOT a global sort. At
    * 100 TB this is the difference between a full shuffle and a scan.
    * Tiebreaker on `tieCol` keeps results deterministic for the oracle.
    */
  def topKNewest(tsCol: String, tieCol: String, k: Int)(df: DataFrame): DataFrame =
    df.orderBy(col(tsCol).desc, col(tieCol).asc).limit(k)

  /** U1 (main.go:180-187): n-ary union of per-table batches. `unionByName`
    * is resilient to column-order drift between sources.
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))

  /** A1 (main.go:194-200): max timestamp of the batch — as a plan node
    * (partial max per partition + single merge), not a driver-side loop.
    */
  def maxTimestamp(tsCol: String)(df: DataFrame): DataFrame =
    df.agg(max(col(tsCol)).as("max_ts"))

  /** S4 (main.go:220-223): hive-style time partition derivation. The
    * reference places the whole batch under ONE `year=/month=` prefix
    * chosen from the max timestamp (lossy when a batch spans months);
    * we derive per-row partitions — the semantically correct layout that
    * partition pruning needs (SURVEY §2.1 S4).
    */
  def withTimePartitions(tsCol: String)(df: DataFrame): DataFrame =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))

  /** S2+S4 sink (main.go:46-85,220-223): partitioned snappy parquet.
    * Spark's committer gives atomic-per-task semantics the reference's
    * buffered PutObject lacks. `partitionBy` yields a `year=/month=`
    * layout; note Spark writes `month=3` where the reference
    * zero-pads `month=03` (main.go:220) — readers should address
    * partitions with pruning predicates (`month = 3`), not
    * reference-style zero-padded path globs.
    */
  def writeArchive(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("compression", "snappy")
      .partitionBy("year", "month")
      .parquet(path)

  /** Idempotent (exactly-once-per-row) archive append — SURVEY §3.1:
    * the reference re-archives rows when a run crashes between upload
    * and delete (duplicate objects). Here the archive itself is the
    * dedup state: the incoming batch is anti-joined against the
    * already-archived (table_name, id) keys before appending, so
    * re-running an interrupted archival writes only missing rows.
    *
    * Scale note: the anti-join reads ONLY the archive partitions the
    * batch can touch — the batch's year/month set is pushed as a
    * partition-pruning filter (derived from the batch min/max
    * timestamp, a cheap agg), never a full archive scan.
    */
  /** Partition-pruning predicate covering exactly the batch's
    * (year, month) set — push this into any read of the archive that
    * only concerns the batch's rows (idempotent append, verify-before-
    * delete), so the read scans the touched partitions, not the whole
    * archive. The distinct-months collect is bounded by the batch's
    * time span (a handful of rows), never by archive size.
    */
  def timePartitionFilter(batch: DataFrame): Column = {
    val months = batch.select(col("year"), col("month")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    months.map { case (y, m) =>
      col("year") === y && col("month") === m
    }.reduceOption(_ || _).getOrElse(lit(false))
  }

  def appendIdempotent(batch: DataFrame, archiveDir: String): Long = {
    val spark = batch.sparkSession
    // Accept pre-derived year/month (e.g. ArchiverMain derives them while
    // the column is still timestamp-typed, then converts it to the
    // reference's epoch-nanos int64 shape, on which year() can't run).
    val shaped =
      if (batch.columns.contains("year") && batch.columns.contains("month")) batch
      else batch.transform(withTimePartitions("timestamp"))
    val existing =
      try {
        val arch = spark.read.parquet(archiveDir)
        Some(arch.filter(timePartitionFilter(shaped))
          .select(col("table_name"), col("id")))
      } catch {
        // Two conditions mean "first run — nothing to dedup against":
        // a missing archive dir, and a dir with no committed parquet
        // footers (UNABLE_TO_INFER_SCHEMA — a crash mid-first-write
        // leaves only _temporary/, which spark.read.parquet cannot
        // schema-infer; treating it as fatal would wedge every rerun).
        // Any other analysis failure (e.g. foreign data in the dir
        // lacking table_name/id) must propagate: silently skipping the
        // anti-join would append duplicates and break the exactly-once
        // guarantee.
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" ||
              e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
      }
    val fresh = existing match {
      case Some(keys) =>
        shaped.join(keys, Seq("table_name", "id"), "left_anti")
      case None => shaped
    }
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode("append")
        .option("compression", "snappy")
        .partitionBy("year", "month")
        .parquet(archiveDir)
    n
  }

  /** The whole §3.1 pipeline as one composed plan: per-source
    * project→filter→top-k→stamp, union, partition-derive. This is the
    * flagship (`SparkEntry.entry`) shape: every [REF] operator in one
    * declarative query that Catalyst plans end-to-end.
    */
  def archivePipeline(
      sources: Seq[(String, DataFrame)],
      tsCol: String, idCol: String, cutoff: String, batchSize: Int): DataFrame = {
    val perTable = sources.map { case (name, df) =>
      val shaped = df
        .transform(retentionFilter(tsCol, cutoff))
        .transform(topKNewest(tsCol, idCol, batchSize))
        .transform(stampTableName(name))
      shaped
    }
    unionAll(perTable).transform(withTimePartitions(tsCol))
  }

  /** Per-time-partition integrity digest — the safety check the
    * reference's archive-then-DELETE cycle is missing (main.go:88-129
    * deletes source rows on the strength of a write that was never
    * read back): run this over BOTH the source extract and the written
    * archive partition and compare before deleting.
    *
    * The digest is a bit_xor of per-row 60-bit md5 prefixes over a
    * canonical row string, so it is ORDER-INDEPENDENT (parquet scans
    * return rows in any order) and aggregates with constant state per
    * partition — one map-side-combined shuffle at any scale. Doubles
    * and timestamps enter the canonical string through DECIMAL(18,6)
    * and epoch-nanos casts: both engines (and both sides of a
    * source/archive comparison) format those identically, where raw
    * double/timestamp rendering differs.
    */
  def partitionChecksums(df: DataFrame, tsCol: String,
      canonCols: Seq[Column]): DataFrame =
    groupChecksums(df.transform(withTimePartitions(tsCol)),
      Seq("year", "month"), canonCols)

  /** Digest grouped by existing columns (for data already carrying its
    * partition columns, e.g. the written archive).
    *
    * Canonical row encoding is SELF-DELIMITING, not delimiter-joined:
    * each field becomes `N` when NULL and `V<len>:<value>` otherwise,
    * and the tokens are concatenated. A `concat_ws` encoding would
    * silently SKIP NULL fields ((a,NULL,b) and (a,b,NULL) both render
    * "a|b") and a delimiter byte inside a value would shift field
    * boundaries (("a|b", "c") vs ("a", "b|c")) — either lets two
    * different rows collide to one digest, which is fatal for a check
    * that gates a destructive DELETE. The length prefix makes the
    * concatenation injective for any field content.
    */
  def groupChecksums(df: DataFrame, groupCols: Seq[String],
      canonCols: Seq[Column]): DataFrame = {
    val canon = concat(canonCols.map { c =>
      val s = c.cast("string")
      when(s.isNull, lit("N"))
        .otherwise(concat(lit("V"), length(s), lit(":"), s))
    }: _*)
    val rowHash = conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), bit_xor(rowHash).as("checksum"))
  }

  /** Archive maintenance: compact a `year=/month=` partition's small
    * files. The reference emits one object per run (main.go:46-85) and
    * [[appendIdempotent]] likewise appends ≥1 file per touched partition
    * per run — at daily cadence over years that is the classic
    * small-files failure (a 100 TB archive read becomes millions of
    * file opens and a listing storm). Each partition whose file count
    * exceeds ceil(bytes / targetMB) is rewritten into exactly that many
    * files, and the swap is REFUSED unless the rewrite's
    * order-independent digest ([[groupChecksums]] over `canonCols`)
    * equals the original's — the same verify-before-destroy gate as
    * GRAFT_VERIFY, so compaction can never silently lose or mutate a
    * row.
    *
    * Staging dirs are dot-prefixed, which `FileInputFormat` ignores —
    * concurrent readers of the archive never see half-written files.
    * Crash safety: before any original moves to the backup dir, the
    * rewrite's file names are written to a `_MANIFEST` inside it; a
    * later run finding a leftover backup ROLLS BACK (restores the
    * originals, removing exactly the manifest-named partially-swapped
    * files) while rewrite files remain staged, and ROLLS FORWARD
    * (drops the backup) once the staging dir is empty — i.e. the swap
    * had completed. Every recovery step is idempotent renames/deletes,
    * so a crash during recovery re-recovers. Concurrent appends are
    * safe too: the rewrite covers EXACTLY the file set listed at the
    * start (read by explicit paths, not by directory), so a file
    * appended mid-compaction is never digested, backed up, or deleted
    * — it simply survives the swap untouched.
    *
    * @return (partitions compacted, total files before, after)
    */
  /** Snapshot diff — the archive-maintenance audit between two
    * generations of the same table (e.g. the archive before and after a
    * re-extraction, or PG-now vs archive-then): rows `added` (key only
    * in `b`), `removed` (key only in `a`), and `changed` (key in both,
    * any compared column differing under null-safe equality). Unchanged
    * rows are excluded — the output is the delta, sized by drift, not
    * by the table.
    *
    * The reference has no such check: a crashed run between upload and
    * delete (main.go:211-251) silently re-archives rows; this operator
    * is how that drift becomes visible (and is the verification step
    * behind appendIdempotent's crash-safety story).
    *
    * Scale shape: ONE full-outer sort-merge/shuffle-hash join on the
    * key — bucketable on `keyCol`, no window, no broadcast of anything
    * table-sized. Column comparison is null-safe `<=>` per column (no
    * row serialization); at very wide schemas swap in a map-side
    * fingerprint column (xxhash64 of the packed row) computed at WRITE
    * time so the diff join carries 8 bytes per side instead of the row.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs at least one compare column")
    val aSide = a.select((col(keyCol).as("key") +: lit(1L).as("in_a") +:
      compareCols.map(c => col(c).as(s"a_$c"))): _*)
    val bSide = b.select((col(keyCol).as("key") +: lit(1L).as("in_b") +:
      compareCols.map(c => col(c).as(s"b_$c"))): _*)
    val differs = compareCols
      .map(c => !(col(s"a_$c") <=> col(s"b_$c")))
      .reduce(_ || _)
    aSide.join(bSide, Seq("key"), "full_outer")
      .withColumn("status",
        when(col("in_b").isNull, lit("removed"))
          .when(col("in_a").isNull, lit("added"))
          .when(differs, lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("key"), col("status"))
      .orderBy(col("key"))
  }

  /** CDC apply — merge a change set onto a base snapshot: `D` rows
    * delete by key, any other op ('I' insert / 'U' update) REPLACES the
    * keyed row with the change row (upsert semantics; the change frame
    * carries full rows). One key per change row is the caller's
    * contract — last-writer-wins folding belongs upstream, keyed on the
    * change-log sequence.
    *
    * This is the reference's delete loop (main.go:131-145) generalized
    * to the three-op merge an incremental archive actually needs: the
    * reference can only `DELETE WHERE timestamp < cutoff`; this applies
    * an exact keyed delta.
    *
    * Scale shape: untouched = base ANTI JOIN changes (one keyed join,
    * bucketable on the key like every snapshot op here), result =
    * untouched ∪ non-delete change rows (union-all adds no exchange).
    * Output size = |base| − |D| + |I∪U|; never a cross product, nothing
    * table-sized broadcast.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String, validate: Boolean = false): DataFrame = {
    val dataCols = base.columns.toSeq
    require(changes.columns.contains(opCol),
      s"changes is missing the op column '$opCol'")
    require(dataCols.forall(changes.columns.contains),
      "changes must carry every base column (full-row upserts)")
    // One-key-per-change-row contract (ADVICE r10): duplicate keys in
    // `changes` would silently emit duplicate output keys (and one D
    // row would drop ALL same-keyed base rows). `validate` enforces it
    // loudly WITHOUT a driver action — a lazy per-key window count that
    // raise_error()s at execution time. Off by default: the window adds
    // a shuffle of the (delta-sized) changes frame, and CDC feeds with
    // an upstream uniqueness guarantee shouldn't pay it twice.
    val checked =
      if (!validate) changes
      else {
        // The guard lives in a FILTER predicate (not a dropped
        // projection — column pruning would erase that): rows with a
        // unique key pass `true`, a duplicate key evaluates raise_error.
        val w = Window.partitionBy(col(keyCol))
        changes
          .withColumn("_dup_n", count(lit(1)).over(w))
          .filter(when(col("_dup_n") > 1,
              raise_error(concat(
                lit("applyChanges: duplicate key in changes: "),
                col(keyCol).cast("string"))).isNull)
            .otherwise(lit(true)))
          .drop("_dup_n")
      }
    val untouched = base.join(checked.select(col(keyCol)),
      Seq(keyCol), "left_anti")
    val upserts = checked.filter(col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
    untouched.unionByName(upserts).orderBy(col(keyCol))
  }

  def compactPartitions(spark: SparkSession, archiveDir: String,
      targetMB: Int, canonCols: Seq[Column]): (Int, Int, Int) = {
    require(targetMB > 0, "targetMB must be > 0")
    val root = new Path(archiveDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def digest(df: DataFrame): (Long, Long) = {
      val r = groupChecksums(df, Seq.empty, canonCols).collect().head
      val n = r.getLong(r.fieldIndex("n_rows"))
      // bit_xor over zero rows is NULL: a partition whose files are all
      // empty must digest as (0, 0) and compact normally, not NPE the run
      (n, if (n == 0) 0L else r.getLong(r.fieldIndex("checksum")))
    }
    val leafDirs = for {
      y <- fs.listStatus(root).toSeq
      if y.isDirectory && y.getPath.getName.startsWith("year=")
      m <- fs.listStatus(y.getPath).toSeq
      if m.isDirectory && m.getPath.getName.startsWith("month=")
    } yield m.getPath
    var compacted = 0
    var before = 0
    var after = 0
    leafDirs.foreach { part =>
      val tmp = new Path(part.getParent, "." + part.getName + ".compact_tmp")
      val bak = new Path(part.getParent, "." + part.getName + ".compact_bak")
      recoverInterruptedCompaction(fs, part, tmp, bak)
      val files = dataFiles(fs, part)
      before += files.length
      val want = math.max(1, math.ceil(
        files.map(_.getLen).sum.toDouble / (targetMB.toLong << 20)).toInt)
      if (files.length <= want) after += files.length
      else {
        // read EXACTLY this snapshot of files: a concurrently appended
        // file is neither digested nor backed up nor deleted below
        val df = spark.read.parquet(files.map(_.getPath.toString): _*)
        val expect = digest(df)
        fs.delete(tmp, true): Unit
        // coalesce, not repartition: pure file merge, no shuffle
        df.coalesce(want).write.mode("overwrite")
          .option("compression", "snappy").parquet(tmp.toString)
        val got = digest(spark.read.parquet(tmp.toString))
        require(got == expect,
          s"compaction digest mismatch for $part: rewrite=$got " +
            s"original=$expect — partition left untouched")
        fs.delete(bak, true): Unit
        require(fs.mkdirs(bak), s"cannot create backup dir $bak")
        val rewritten = dataFiles(fs, tmp)
        // manifest BEFORE any original moves: the rollback contract
        val mf = fs.create(new Path(bak, "_MANIFEST"), true)
        try mf.write(rewritten.map(_.getPath.getName).mkString("\n")
          .getBytes("UTF-8"))
        finally mf.close()
        files.foreach { f =>
          require(fs.rename(f.getPath, new Path(bak, f.getPath.getName)),
            s"backup rename failed: ${f.getPath}")
        }
        rewritten.foreach { f =>
          require(fs.rename(f.getPath, new Path(part, f.getPath.getName)),
            s"swap-in rename failed: ${f.getPath}")
        }
        fs.delete(tmp, true): Unit
        fs.delete(bak, true): Unit
        compacted += 1
        after += rewritten.length
      }
    }
    (compacted, before, after)
  }

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: Path) =
    fs.listStatus(dir).filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Recovery from a compaction interrupted mid-swap (see
    * [[compactPartitions]]): backup present + rewrite files still
    * staged ⇒ the swap did not finish — roll BACK (remove the
    * manifest-named files already swapped in, restore every original);
    * backup present + staging empty ⇒ the digest-verified swap
    * finished — roll FORWARD (drop the backup). A backup without a
    * manifest means nothing was moved yet: plain cleanup.
    */
  private def recoverInterruptedCompaction(
      fs: org.apache.hadoop.fs.FileSystem,
      part: Path, tmp: Path, bak: Path): Unit = {
    if (!fs.exists(bak)) return
    val manifest = new Path(bak, "_MANIFEST")
    if (!fs.exists(manifest)) {
      fs.delete(bak, true): Unit
      fs.delete(tmp, true): Unit
      return
    }
    val swapIncomplete = fs.exists(tmp) && dataFiles(fs, tmp).nonEmpty
    if (swapIncomplete) {
      val in = fs.open(manifest)
      val names =
        try new String(in.readAllBytes(), "UTF-8").split("\n")
          .map(_.trim).filter(_.nonEmpty)
        finally in.close()
      names.foreach { nm => fs.delete(new Path(part, nm), false): Unit }
      dataFiles(fs, bak).foreach { f =>
        require(fs.rename(f.getPath, new Path(part, f.getPath.getName)),
          s"recovery restore failed: ${f.getPath}")
      }
    }
    fs.delete(tmp, true): Unit
    fs.delete(bak, true): Unit
  }
}
