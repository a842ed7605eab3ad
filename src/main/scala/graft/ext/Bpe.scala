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

  /** Batched BPE training — the 100 TB shape [[pairMerges]]'s scaladoc
    * promises: each rewrite pass applies a SET of up to `pairsPerRound`
    * merges chosen greedily SYMBOL-DISJOINT from the round's top
    * `candidatePool` pairs (ordered n desc, lft, rgt), so a 30k-merge
    * production run costs O(30k / K) corpus passes instead of 30k.
    *
    * Why disjointness makes the one-pass rewrite exact: two matches at
    * adjacent positions share their middle token, so under
    * symbol-disjoint pairs consecutive matches can only come from the
    * SAME self-pair (a, a) — exactly the run case [[pairMerges]]'s
    * cumulative-count + min-over-run algebra already resolves greedily
    * left-to-right. The same algebra runs unchanged with the match
    * predicate generalized from one (left, right) literal to the
    * round's broadcast merge set.
    *
    * Determinism: the candidate pool is a bounded TakeOrdered collect
    * (`candidatePool` rows — the IVF-seed pattern, NEVER corpus-sized)
    * under the (n desc, lft, rgt) total order; the greedy scan over it
    * is driver-side but pure; the oracle unrolls the identical
    * pool-then-greedy picks in SQL, so the merge table is hash-exact.
    * Pool truncation is part of the CONTRACT (both engines pick from
    * the same top-`candidatePool` list), not an approximation knob.
    *
    * Returns (merge_round, ord, lft, rgt, n_pairs): `ord` is the
    * pair's 1-based position in its round's greedy selection.
    */
  def pairMergesBatched(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int, pairsPerRound: Int, candidatePool: Int = 64,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1, 16], got $rounds")
    require(pairsPerRound >= 1 && pairsPerRound <= 16,
      s"pairsPerRound must be in [1, 16], got $pairsPerRound")
    require(candidatePool >= pairsPerRound,
      s"candidatePool ($candidatePool) must cover pairsPerRound " +
        s"($pairsPerRound)")
    val spark = docs.sparkSession
    import spark.implicits._
    val wDoc = Window.partitionBy(col("doc")).orderBy(col("pos").asc)
    var toks = materialize(docs
      .select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok"))))
    val merges = Seq.newBuilder[(Int, Int, String, String, Long)]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val pool = toks
        .withColumn("nxt", lead(col("tok"), 1).over(wDoc))
        .filter(col("nxt").isNotNull)
        .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc, col("nxt").asc)
        .limit(candidatePool)
        .collect() // bounded: candidatePool rows
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // greedy symbol-disjoint selection over the ordered pool
      val picked = Seq.newBuilder[(String, String, Long)]
      var used = Set.empty[String]
      var k = 0
      pool.foreach { case (l, r, n) =>
        if (k < pairsPerRound && !used(l) && !used(r)) {
          picked += ((l, r, n)); used = used + l + r; k += 1
        }
      }
      val sel = picked.result()
      if (sel.isEmpty) exhausted = true
      else {
        sel.zipWithIndex.foreach { case ((l, r, n), i) =>
          merges += ((round, i + 1, l, r, n)) }
        // match predicate + merged spelling as literal CASE chains —
        // pairsPerRound is tiny, so this stays one codegen'd projection
        // (the SQL twin LEFT JOINs its sel CTE; same row semantics)
        val isMatch = sel.map { case (l, r, _) =>
          col("tok") === l && col("nxt") === r }.reduce(_ || _)
        val spelled = sel.foldLeft(col("tok")) { case (acc, (l, r, _)) =>
          when(col("tok") === l && col("nxt") === r,
            lit(l + "+" + r)).otherwise(acc) }
        val next = toks
          .withColumn("nxt", lead(col("tok"), 1).over(wDoc))
          .withColumn("m", coalesce(isMatch, lit(false)))
          .withColumn("rnm", sum(when(col("m"), 1L).otherwise(0L))
            .over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("runkey", when(col("m"), col("pos") - col("rnm")))
          .withColumn("runstart", min(when(col("m"), col("pos")))
            .over(Window.partitionBy(col("doc"), col("runkey"))))
          .withColumn("take",
            col("m") && (col("pos") - col("runstart")) % 2 === 0)
          .withColumn("ptk", lag(col("take"), 1, false).over(wDoc))
          .filter(!col("ptk"))
          .select(col("doc"), row_number().over(wDoc).as("pos"),
            when(col("take"), spelled).otherwise(col("tok")).as("tok"))
        toks = materialize(next)
      }
    }
    merges.result()
      .toDF("merge_round", "ord", "lft", "rgt", "n_pairs")
      .orderBy(col("merge_round"), col("ord"))
  }
}
