package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale mechanics that only matter beyond one machine (SURVEY.md
  * "100 TB design"): salted joins for skewed keys, bucketed tables for
  * shuffle-free co-located joins. Both are exercised by ScaleSpec.
  */
object Scale {

  /** Skew-safe equi-join: salt the skewed (left) side's key into
    * `saltBuckets` sub-keys and explode the build (right) side across
    * all salts, so one hot key spreads over `saltBuckets` tasks instead
    * of melting a single reducer. Semantics identical to
    * `left.join(right, leftKey === rightKey, "inner")`.
    *
    * (AQE's skewedJoin handles sort-merge skew automatically at
    * runtime; explicit salting remains the tool for hash-partitioned
    * aggregations and for engines/paths AQE does not cover.)
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltBuckets: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val exploded = right.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(exploded,
        salted(leftKey) === exploded(rightKey) &&
          salted("__salt") === exploded("__salt"))
      .drop("__salt")
  }

  /** Write two frames bucketed by their join key: subsequent joins on
    * that key read co-located buckets and skip the shuffle entirely —
    * the batch answer to "this join runs every night on 100 TB".
    * Returns the two re-loaded bucketed tables.
    */
  def writeBucketedPair(spark: SparkSession,
      a: DataFrame, aName: String, aKey: String,
      b: DataFrame, bName: String, bKey: String,
      buckets: Int): (DataFrame, DataFrame) = {
    a.write.mode("overwrite").bucketBy(buckets, aKey).sortBy(aKey)
      .saveAsTable(aName)
    b.write.mode("overwrite").bucketBy(buckets, bKey).sortBy(bKey)
      .saveAsTable(bName)
    (spark.table(aName), spark.table(bName))
  }
}
