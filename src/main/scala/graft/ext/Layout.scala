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
    * Scale shape: Z-value and bucket are map-side expressions (bucket
    * = uniform scaling of z into `nBuckets` by the broadcast max — at
    * a rewrite this becomes the range-partitioner key, so the stats
    * job IS the partitioning dry run); the only exchange is the
    * two-phase (bucket) aggregation. No window, no global sort, no
    * per-row state — survives any corpus size.
    */
  def zorderBucketStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val z = df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .withColumn("z", zorderValue(col("x"), col("y"), bits))
    val zmax = z.agg(max(col("z")).as("zmax"))
    // broadcast single-row scalar (the established above-avg pattern):
    // bucket = floor(z · nBuckets / (zmax+1)) ∈ [0, nBuckets)
    z.crossJoin(broadcast(zmax))
      .withColumn("bucket",
        floor(col("z") * lit(nBuckets.toDouble) / (col("zmax") + lit(1L)))
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
        min(col("y")).as("y_lo"), max(col("y")).as("y_hi"))
      .orderBy(col("bucket"))
  }
}
