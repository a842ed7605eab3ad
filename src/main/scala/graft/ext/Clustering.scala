package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ArrayMath.l2sqF

/** DataFrame-native k-means (Lloyd's algorithm) over an embedding
  * column — the training step behind a real IVF index (the reference's
  * similarity surface stops at search; clustering is what makes the
  * cell layout principled rather than "first k vectors").
  *
  * Scale shape per iteration: centroids are k·dim floats — a broadcast
  * row set, never a shuffle key. Assignment is ONE corpus scan: the
  * k distances per vector run through the codegen'd `l2sq_f32`
  * expression against broadcast centroids, and the argmin collapses
  * map-side (partial `min(struct(d2, cell))` aggregation), so the only
  * shuffle carries one row per vector. Recompute is the proven
  * [[Similarity.labelCentroids]] shape: positional explode + one
  * (cell, dim)-keyed decimal-sum aggregation (order-independent, so
  * bit-stable under any partitioning). Centroid frames are always ≤k
  * rows, so every iteration coalesces them to one partition — centroid
  * stages are single tasks instead of `shuffle.partitions` mostly-empty
  * ones. Lineage control is structural since r15: [[lloyd]] collects
  * the ≤k-row centroid set to the driver per iteration and re-broadcasts
  * it as a literal frame, so training lineage never grows, nothing can
  * recompute per broadcast (the r7 6.3 s lazy-training regression), and
  * no per-round eager checkpoint jobs exist to pay for (the r6
  * eager-tiny-job class).
  */
object Clustering {

  /** Deterministic seeds: the first k corpus vectors by id (k-means∥
    * style sampling adds nothing on synthetic uniform data and would
    * cost determinism; at real scale swap the seed set, not the loop).
    */
  def seedCentroids(corpus: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.orderBy(col(idCol)).limit(k)
      .select(
        (row_number().over(Window.orderBy(col(idCol))) - 1).as("cell_id"),
        col(vecCol).as("centroid"))

  /** Nearest-centroid assignment: (idCol, cell_id, d2, vecCol) — ties
    * break toward the smaller cell_id via the lexicographic
    * `array_min(struct(d2, cell_id))` fold over the packed centroid
    * array. ZERO shuffle (r8): the ≤k centroid rows collapse into ONE
    * broadcast array row and the argmin runs per corpus row map-side —
    * the `crossJoin(broadcast) + groupBy(min(struct))` formulation this
    * replaced shuffled one row per VECTOR, i.e. a full-corpus exchange
    * per Lloyd iteration at 100 TB. The distance HOF is interpreted
    * (HigherOrderFunctions are CodegenFallback), a per-row constant
    * factor traded for the corpus-wide shuffle; `array_min` over
    * struct(d2, cell_id) keeps the exact lexicographic tie-break of
    * `min(struct(...))`, and cells with a null centroid are filtered
    * before the fold (they could otherwise win the argmin — struct
    * ordering puts nulls first).
    *
    * Contract: `idCol` must be unique in `vecs`. The per-row fold emits
    * one output row per INPUT row — unlike the replaced
    * `groupBy(idCol).agg(min(struct(...)))`, which silently collapsed
    * duplicate ids to one row. Nothing here enforces uniqueness
    * (enforcing it would cost exactly the corpus-wide exchange this
    * formulation exists to avoid); callers with non-unique ids must
    * dropDuplicates first. Fixture `vec_id` is unique by construction.
    */
  def assign(vecs: DataFrame, centroids: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val packed = centroids
      .agg(sort_array(collect_list(struct(col("cell_id"), col("centroid"))))
        .as("cells"))
    val scored = transform(
      filter(col("cells"), c => c.getField("centroid").isNotNull),
      c => struct(l2sqF(col(vecCol), c.getField("centroid")).as("d2"),
        c.getField("cell_id").as("cell_id")))
    vecs.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(packed))
      .withColumn("m", array_min(scored))
      // empty/all-null centroid set: the old inner join dropped every
      // row; keep that contract
      .filter(col("m.cell_id").isNotNull)
      .select(col(idCol), col("m.cell_id").as("cell_id"),
        col("m.d2").as("d2"), col(vecCol))
  }

  /** Per-(cell, dim) mean of the assigned vectors, decimal-summed for
    * order-independence: (cell_id, dim, n, centroid). This long form is
    * the oracle-checkable surface; [[packCentroids]] folds it back to
    * one array row per cell for the next iteration.
    */
  def centroidStats(assigned: DataFrame,
      vecCol: String = "embedding"): DataFrame =
    assigned
      .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("cell_id"), col("dim"))
      .agg(count(lit(1)).as("n"),
        (sum(bround(col("v").cast("double"), 9).cast("decimal(18,9)"))
          .cast("double") / count(lit(1))).as("centroid"))

  /** (cell_id, dim, centroid) rows → (cell_id, array<float> centroid). */
  def packCentroids(stats: DataFrame): DataFrame =
    stats.groupBy(col("cell_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("centroid")))),
        s => s.getField("centroid").cast("float")).as("centroid"))

  /** `iters` Lloyd iterations from the deterministic seeds. A cell that
    * loses every member keeps its previous centroid (standard empty-
    * cluster fallback — dropping it would shrink k mid-run).
    *
    * EAGER AT CALL TIME (ADVICE r15, stated plainly): this runs
    * 1 + iters full-corpus Spark jobs when CALLED — before any action
    * on the returned frame — and so do [[Similarity.ivfIndex]] /
    * [[Similarity.ivfTopK]], which call it during construction. Don't
    * construct speculatively; training failures surface here, not at
    * the first downstream action. The returned frame itself is a
    * driver-local literal (LocalTableScan) and costs nothing to reuse.
    *
    * The reduce step COLLECTS: centroids are k·dim floats — driver-tiny
    * whatever the corpus size — so each iteration ends with a bounded
    * ≤k-row collect (the k-means reduce every production implementation
    * uses, and the codebase's established bounded-collect pattern: PQ
    * seed vectors, the BPE candidate pool) and the next iteration's
    * assignment broadcasts them back as a literal frame. That removes
    * the per-iteration materialize/left-join machinery this replaced
    * (r15 optimization): each iteration is exactly ONE corpus-scan agg
    * job, lineage never grows (the returned frame is a LocalTableScan),
    * and the old failure modes — lazy training re-running per broadcast
    * (r7, 6.3 s), eager per-round checkpoint jobs — are impossible by
    * construction. Values are bit-identical: the same decimal-mean
    * recompute, argmin tie-break, and keep-previous fallback, just
    * coalesced on the driver (ClusteringSpec determinism/monotonicity
    * pins, PqSpec's per-subspace equality pin, and the pinned IVF
    * digests all hold unchanged).
    */
  def lloyd(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def asFrame(cur: Seq[(Int, Array[Float])]): DataFrame =
      cur.toDF("cell_id", "centroid")
        .select(col("cell_id"), col("centroid").cast("array<float>")
          .as("centroid"))
    var cur: Seq[(Int, Array[Float])] =
      seedCentroids(corpus, k, idCol, vecCol)
        .as[(Int, Array[Float])].collect().toSeq // bounded: ≤ k rows
    for (_ <- 0 until iters if cur.nonEmpty) {
      val next = packCentroids(
          centroidStats(assign(corpus, asFrame(cur), idCol, vecCol), vecCol))
        .as[(Int, Array[Float])].collect().toMap // bounded: ≤ k rows
      cur = cur.map { case (c, prev) => (c, next.getOrElse(c, prev)) }
    }
    asFrame(cur).coalesce(1)
  }

  /** Total within-cluster squared distance — the monotone objective
    * Lloyd minimizes; ClusteringSpec asserts it never increases across
    * iterations. One scan + a global decimal sum.
    */
  def inertia(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Double =
    assign(corpus, centroids, idCol, vecCol)
      .agg(sum(col("d2").cast("decimal(28,9)")).cast("double"))
      .head().getDouble(0)
}
