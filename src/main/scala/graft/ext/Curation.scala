package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation (the north-star composition):
  *
  *   quality gate → exact dedup → near-dup dedup → survivors
  *
  * Each stage is one of the already-verified operators; this module
  * only composes them, preserving determinism (every drop decision is
  * a pure function of content + doc_id). At 100 TB each stage is a
  * bounded shuffle: the quality gate is a scan, exact dedup one
  * hash-partition by content hash, near-dup the blocked inverted-index
  * join — nothing quadratic, nothing driver-side.
  */
object Curation {

  /** Quality gate: minimum token count and in-vocabulary signal
    * (stopword presence). Deterministic per row.
    */
  def qualityGate(docs: DataFrame, textCol: String,
      minTokens: Int): DataFrame =
    TextAnalysis.qualityFeatures(docs, textCol)
      .filter(col("n_tokens") >= minTokens)

  /** Exact dedup: keep the lowest doc_id of every identical text. */
  def dropExactDupes(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = Dedup.exactGroups(docs, textCol, idCol)
      .select(col("keep_id").as(idCol))
    docs.join(keep, idCol)
  }

  /** Near-dup dedup: drop every doc that is J ≥ threshold similar to a
    * LOWER-id doc (the higher id of each near-dup pair). Deterministic
    * and order-free: the drop set is { b | ∃ (a,b), a<b, J(a,b) ≥ t }.
    */
  def dropNearDupes(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val drops = Dedup.ngramJaccardPairs(docs, textCol, idCol, 3, threshold)
      .select(col("b_id").as(idCol)).distinct()
    docs.join(drops, Seq(idCol), "left_anti")
  }

  /** The full pipeline. Returns surviving rows with quality features. */
  def curate(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 20, nearDupThreshold: Double = 0.8): DataFrame = {
    val gated = qualityGate(docs, textCol, minTokens)
    val exact = dropExactDupes(gated, textCol, idCol)
    dropNearDupes(exact, textCol, idCol, nearDupThreshold)
  }
}
