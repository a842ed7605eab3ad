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
  /** `events.ts` has shipped under two physical parquet types across
    * fixture generations: TIMESTAMP(NANOS) (r1-r7; unreadable natively,
    * [PARQUET_TYPE_ILLEGAL], so the legacy flag surfaces it as a nanos
    * Long) and plain timestamp[us] (r8 regeneration; arrives as
    * TIMESTAMP_NTZ under Spark 4's parquet NTZ inference). Loading with
    * the flag set is safe for both — it only affects NANOS columns — so
    * `eventsNative` reads once and callers branch on the loaded dtype.
    * Any OTHER dtype is fixture drift and must fail loudly, not produce
    * silently-wrong timestamps (see FixtureCheck / FixtureSchemaSpec).
    */
  def eventsNative(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }

  /** The NTZ fixture encoding stores wall-clock datetimes;
    * canonicalizing to TimestampType reinterprets them in the SESSION
    * timezone. Under the engine's UTC determinism contract (SURVEY
    * §5.1) that reproduces the exact epoch-µs of the legacy nanos-Long
    * encoding; under any other session timezone the two encodings
    * would silently disagree on every absolute-epoch surface
    * (epochNanos, unix_micros, the mixed-generation union). Loud
    * failure instead.
    */
  private[graft] def requireUtcForNtz(s: SparkSession): Unit = {
    val tz = s.conf.get("spark.sql.session.timeZone")
    require(java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC,
      s"events.ts arrives as TIMESTAMP_NTZ and is reinterpreted in the " +
        s"session timezone, which is '$tz', not UTC — the nanos-Long and " +
        "timestamp[us] fixture encodings would disagree on epoch values. " +
        "Set spark.sql.session.timeZone=UTC (SURVEY §5.1 determinism " +
        "contract).")
  }

  private def badTsType(dt: DataType): Nothing = throw new IllegalStateException(
    s"events.ts has unsupported dtype ${dt.sql}: expected BIGINT (epoch " +
      "nanos, legacy fixtures), TIMESTAMP, or TIMESTAMP_NTZ (current " +
      "fixtures). The testdata schema drifted again — update Tables.events.")

  /** Canonical events view: `ts` is always Spark TimestampType (µs, UTC
    * session). Nanos-Long fixtures floor-truncate ns→µs (`ts div 1000`,
    * matching DuckDB's ns→µs cast); timestamp fixtures pass through
    * (NTZ reinterpreted as UTC — the generator writes naive-UTC wall
    * times, so the epoch-µs values are identical to the legacy path's).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = eventsNative(s, d)
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _: TimestampNTZType =>
        requireUtcForNtz(s)
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => badTsType(other)
    }
  }

  /** Raw events with `ts` as an epoch-nanos Long (for F3-style queries).
    * On timestamp-typed fixtures the nanos view is derived
    * (`unix_micros(ts) * 1000` — zero-padded ns, the same convention as
    * the archive shape); note a predicate on the DERIVED column cannot
    * reach the scan — filter-pushdown paths must branch on
    * [[eventsTsIsNanosLong]] and compare in the native column space
    * (see RefQueries.eventsAsIotBefore).
    */
  def eventsRawNanos(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = eventsNative(s, d)
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case _: TimestampNTZType =>
        requireUtcForNtz(s)
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => badTsType(other)
    }
  }

  /** True when the on-disk `events.ts` is the legacy nanos-as-Long
    * encoding (schema-only probe; reads footers, not data).
    */
  def eventsTsIsNanosLong(s: SparkSession, d: String): Boolean =
    eventsNative(s, d).schema("ts").dataType == LongType

  /** Events across a MIXED-generation lake: each directory holds ONE
    * encoding (Spark merges footers per read, so a ns-Long/µs mix in a
    * single read fails schema merge — correctly loudly), and this
    * unions the per-directory canonicalized reads. The migration shape
    * for a multi-year archive while old and new generations coexist
    * (DEPLOY.md); each leg keeps its own native-space predicate
    * pushdown, and union-all adds no exchange.
    */
  def eventsUnionAll(s: SparkSession, dirs: Seq[String]): DataFrame = {
    require(dirs.nonEmpty, "eventsUnionAll needs at least one directory")
    dirs.map(events(s, _)).reduce(_.unionByName(_))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Recursive local-FS delete for the streaming/evolution queries'
    * per-run staging dirs: repeated gate/bench runs must not leak disk
    * (ADVICE r11). Local `java.io.File` only — these staging dirs are
    * always driver-local temp space, never the archive. Two blast-
    * radius guards (ADVICE r12): a symlinked directory is deleted as
    * the LINK, never traversed (File.listFiles follows symlinks, so
    * recursing would delete content OUTSIDE the staging tree), and
    * only paths under java.io.tmpdir are accepted — every call site
    * passes a fresh createTempDirectory path, and the require turns a
    * future wrong-path caller bug into a loud error instead of a
    * recursive delete of live data.
    */
  def rmrf(paths: String*): Unit = paths.foreach { p =>
    // accept both the literal tmpdir prefix and its symlink-resolved
    // form (macOS /tmp → /private/tmp); the TARGET is normalized but
    // never leaf-resolved, so a symlink inside staging stays a link
    val tmpProp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir")).toAbsolutePath.normalize
    val tmpReal =
      try tmpProp.toRealPath() catch { case _: java.io.IOException => tmpProp }
    val t = java.nio.file.Paths.get(p).toAbsolutePath.normalize
    // STRICTLY below the tmp root: startsWith accepts equal paths, so
    // without the != checks a caller bug passing tmpdir itself would
    // recursively delete all of /tmp (Spark scratch, warehouse dirs,
    // other processes' temp files)
    require((t.startsWith(tmpProp) || t.startsWith(tmpReal)) &&
        t != tmpProp && t != tmpReal,
      s"rmrf refuses non-tmp or tmp-root path: $p (tmpdir = $tmpProp)")
    def go(f: java.io.File): Unit = {
      if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
        val cs = f.listFiles()
        if (cs != null) cs.foreach(go)
      }
      f.delete(): Unit
    }
    go(new java.io.File(p))
  }
}
