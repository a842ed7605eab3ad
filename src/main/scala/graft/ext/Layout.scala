package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization operators (the OPTIMIZE ZORDER class).
  *
  * At 100 TB the dominant cost of the reference's read path (archive
  * scans filtered by several dimensions at once — reference
  * README.md:88-102 documents multi-predicate queries over the emitted
  * parquet) is how many files a multi-column predicate can SKIP. A
  * Hive `year=/month=` layout (reference main.go:220-223) prunes on
  * time only; Z-ordering interleaves the bits of two key columns so
  * that sorting by the single Z-value co-locates rows that are close
  * in BOTH dimensions — per-file min/max footers then prune on either
  * column. These operators compute the Z-value as a pure codegen'd
  * integer expression (no shuffle, no UDF) and the per-bucket min/max
  * spans that quantify the clustering a rewrite would achieve.
  */
object Layout {

  /** Morton/Z-value: interleave the low `bits` bits of `x` (even
    * positions) and `y` (odd positions). Pure integer bit arithmetic —
    * whole-stage-codegen'd, map-side only, exact in any engine.
    * `bits ≤ 31` keeps the result within a positive Long (2·31+1 < 63).
    * Caller chooses `bits` to cover the key domain; higher bits of the
    * inputs are deliberately dropped (both engines drop identically).
    */
  def zorderValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL text (for oracle twins): DuckDB
    * and Spark SQL share `>> << & |` on BIGINT with these exact
    * semantics. Kept adjacent to [[zorderValue]] so the two can never
    * drift silently.
    */
  def zorderSqlExpr(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
          s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Layout-quality report: bucket rows by Z-value range (each bucket
    * stands for one output file of a Z-ordered rewrite) and emit the
    * per-bucket min/max of both dimensions — exactly the parquet
    * footer stats a scan would prune on. Tight spans on BOTH columns =
    * the clustering win over a single-column sort.
    *
    * Both dimensions NORMALIZE to the full `bits` range before the
    * interleave — floor((v − vmin) · 2^bits / (vmax − vmin + 1)) —
    * the step every real Z-order rewrite applies: raw interleave of
    * mismatched domains (say an 11-bit and a 7-bit key) leaves the
    * high Z bits all-wide-column, so the narrow column never prunes
    * (measured in ScaleSpec: 5/22 buckets skippable raw vs 56/64
    * normalized on lineitem's partkey/suppkey). Exact-integer inputs
    * through double multiply/divide at these magnitudes are
    * engine-identical bit-for-bit.
    *
    * Scale shape: domain min/max is one broadcast single-row scalar;
    * normalize + interleave + `bucket = z >> (2·bits − log2 nBuckets)`
    * are map-side codegen; the only data exchange is the two-phase
    * (bucket) aggregation. At a rewrite the bucket IS the
    * range-partitioner key, so this job doubles as the dry run. No
    * window, no global sort — survives any corpus size.
    */
  def zorderBucketStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a positive power of two, got $nBuckets")
    val bucketShift = 2 * bits - java.lang.Long.numberOfTrailingZeros(nBuckets.toLong)
    require(bucketShift >= 0,
      s"nBuckets ($nBuckets) exceeds the 4^bits bucket space at bits=$bits")
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val mm = base.agg(min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"))
    val scale = lit((1L << bits).toDouble)
    def normalized(v: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L))
        .otherwise(floor((v - lo) * scale / (hi - lo + lit(1L))))
    base.crossJoin(broadcast(mm))
      .withColumn("z", zorderValue(
        normalized(col("x"), col("xmin"), col("xmax")),
        normalized(col("y"), col("ymin"), col("ymax")), bits))
      .withColumn("bucket", shiftright(col("z"), bucketShift))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
        min(col("y")).as("y_lo"), max(col("y")).as("y_hi"))
      .orderBy(col("bucket"))
  }
}
