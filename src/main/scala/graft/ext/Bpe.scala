package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding-style tokenizer training over a corpus: the
  * iterated most-frequent-adjacent-pair merge (Sennrich et al. 2016),
  * here at the word grain the fixture corpus tokenizes to. Each step
  * counts adjacent pairs corpus-wide, picks the most frequent under
  * the (count desc, left, right) total order, and rewrites every
  * sequence with the pair merged greedily LEFT-TO-RIGHT and
  * NON-OVERLAPPING — `a a a` under the merge (a,a) becomes `[aa, a]`,
  * never `[a, aa]` and never two overlapping merges — the reference
  * BPE semantics.
  *
  * The greedy pass is pure window algebra (no UDF, no per-row state):
  * a match marks positions i with (tok_i, tok_i+1) = (left, right);
  * overlapping matches can only occur in runs of a self-pair
  * (left = right forces tok_i+1 = left = right), and greedy selection
  * keeps exactly the even offsets within each consecutive-match run —
  * computed with one cumulative count + one min-over-run window. The
  * identical algebra runs in the DuckDB oracle, so the merge table is
  * hash-exact, not just plausible.
  *
  * Scale shape per step: pair counting is one two-phase (left, right)
  * agg (map-side combine over doc-local lead()); top-1 is a bounded
  * TakeOrdered collect of ONE row (the IVF-training pattern); the
  * rewrite is doc-keyed windows — every pass reuses the same (doc)
  * partitioning, and `materialize` (localCheckpoint in the registered
  * query) cuts the lineage that would otherwise double per step (the
  * AQE no-subtree-dedup lesson: each state frame feeds BOTH the count
  * and the rewrite). A production 30k-merge run batches many disjoint
  * pairs per rewrite pass instead of one (same algebra over a
  * broadcast merge SET); `steps` is capped accordingly.
  */
object Bpe {

  /** First `steps` merge decisions as (step, lft, rgt, n_pairs) —
    * n_pairs is the corpus-wide adjacent count at selection time.
    * Merged tokens are spelled `left + "+" + right` (the corpus
    * alphabet is [a-z ]; '+' cannot collide).
    */
  def pairMerges(docs: DataFrame, idCol: String, textCol: String,
      steps: Int,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(steps >= 1 && steps <= 16,
      s"steps must be in [1, 16] (batch disjoint pairs beyond), got $steps")
    val spark = docs.sparkSession
    import spark.implicits._
    val wDoc = Window.partitionBy(col("doc")).orderBy(col("pos").asc)
    var toks = materialize(docs
      .select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok"))))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (step <- 1 to steps if !exhausted) {
      val top = toks
        .withColumn("nxt", lead(col("tok"), 1).over(wDoc))
        .filter(col("nxt").isNotNull)
        .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc, col("nxt").asc)
        .limit(1).collect() // bounded: exactly one row
      if (top.isEmpty) exhausted = true
      else {
        val (p1, p2, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, p1, p2, n))
        val merged = p1 + "+" + p2
        val next = toks
          .withColumn("nxt", lead(col("tok"), 1).over(wDoc))
          .withColumn("m", col("tok") === p1 && col("nxt") === p2)
          // cumulative match count → run key (constant inside a run of
          // CONSECUTIVE match positions, distinct across runs)
          .withColumn("rnm", sum(when(col("m"), 1L).otherwise(0L))
            .over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("runkey", when(col("m"), col("pos") - col("rnm")))
          .withColumn("runstart", min(when(col("m"), col("pos")))
            .over(Window.partitionBy(col("doc"), col("runkey"))))
          // greedy = even offset within the run
          .withColumn("take",
            col("m") && (col("pos") - col("runstart")) % 2 === 0)
          .withColumn("ptk",
            lag(col("take"), 1, false).over(wDoc))
          .filter(!col("ptk")) // the right half of a taken pair drops
          .select(col("doc"), row_number().over(wDoc).as("pos"),
            when(col("take"), lit(merged)).otherwise(col("tok")).as("tok"))
        toks = materialize(next)
      }
    }
    merges.result()
      .toDF("step", "lft", "rgt", "n_pairs")
      .orderBy(col("step"))
  }
}
