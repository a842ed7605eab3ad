package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ArrayMath.l2sqF

/** Product quantization (Jégou, Douze, Schmid: "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the code-compression
  * half of a FAISS-style index family, next to IVF
  * ([[Similarity.ivfIndex]]) and scalar int8
  * ([[Similarity.quantizeInt8]]): split the d-dim space into m
  * subspaces of d/m dims, quantize each subvector to one of k
  * per-subspace centroids, and a vector becomes m small codes
  * (m=8, k=16 ⇒ 8 nibbles = 4 bytes per 64-dim float vector — 64×
  * smaller). Search scans CODES, not vectors: a query precomputes an
  * m×k table of partial squared distances once, and each candidate
  * scores as m table lookups (ADC — asymmetric distance computation).
  *
  * Scale shape: training is m independent tiny k-means runs (sample
  * the corpus at 100 TB — the codebook is m·k·(d/m) = k·d floats
  * regardless of corpus size); encoding is ONE corpus scan with a
  * per-row argmin fold against the broadcast packed codebook (zero
  * shuffle — the [[Clustering.assign]] shape per subspace); ADC
  * scoring is one scan of the (tiny) code table with per-row constant
  * work, query tables broadcast. Compose with IVF for IVFADC (codes
  * partitioned by cell) — the postings layout stays
  * [[Similarity.writeIvfIndex]]'s.
  *
  * Determinism: seeds and Lloyd steps are the deterministic
  * [[Clustering]] machinery, the argmin tie-breaks to the smaller
  * code (lexicographic struct min), so codes are a pure function of
  * the corpus SET — digest-pinnable at the gate (q_embed_pq).
  */
object Pq {

  /** Train an (m × k) codebook: per subspace, k-means from
    * deterministic seeds over the sliced subvectors. Returns
    * (subspace, cell_id, centroid) rows — m·k of them, a driver-tiny
    * frame whatever the corpus size. `dsub` = d/m must divide the
    * embedding width (callers slice exhaustively; a ragged tail would
    * silently train on a short subvector).
    *
    * Semantics are EXACTLY m independent [[Clustering.lloyd]] runs
    * (same seeds: the first k vectors by id, sliced; same argmin
    * tie-break; same order-independent decimal-mean recompute; same
    * keep-previous empty-cell fallback) — but executed as ONE corpus
    * scan per iteration for ALL subspaces: the m-run formulation cost
    * 8 × (seed job + assignment agg + pack + join) = 45 one-task jobs
    * at m = 8 and was scheduling-bound (4.9 s at sf0.1 vs 1.3 s for
    * this shape, measured with TimeQ); at 100 TB it's the difference
    * between m corpus scans and one per iteration. PqSpec pins
    * equality against the per-subspace lloyd reference.
    */
  def train(corpus: DataFrame, m: Int, dsub: Int, k: Int, iters: Int = 1,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(m >= 1 && dsub >= 1 && k >= 2, s"bad PQ shape m=$m dsub=$dsub k=$k")
    val spark = corpus.sparkSession
    import spark.implicits._
    // seeds: the first k vectors by id, sliced per subspace — identical
    // to seedCentroids over each sliced corpus; k·d floats, driver-tiny
    val seedVecs = corpus.orderBy(col("vec_id")).limit(k)
      .select(col("embedding")).as[Array[Float]].collect()
    require(seedVecs.length >= 2, s"PQ needs >= 2 vectors, got ${seedVecs.length}")
    var cb = (for (j <- 0 until m; c <- seedVecs.indices) yield
      (j, c, seedVecs(c).slice(j * dsub, (j + 1) * dsub)))
      .toDF("subspace", "cell_id", "centroid")
      .select(col("subspace"), col("cell_id"),
        col("centroid").cast("array<float>").as("centroid"))
      .coalesce(1)
    for (_ <- 0 until iters) {
      // one scan: assign every subvector (the encode fold), explode to
      // (subspace, cell, dim, value), ONE keyed decimal-mean agg —
      // partial aggregation collapses map-side, the shuffle carries at
      // most m·k·dsub keys per map partition (the centroidStats shape)
      val next = encode(corpus, cb, m, dsub)
        .select(posexplode(col("codes")).as(Seq("subspace", "cell_id")),
          col("embedding"))
        .select(col("subspace"), col("cell_id"),
          posexplode(slice(col("embedding"),
            col("subspace") * dsub + 1, lit(dsub))).as(Seq("dim", "v")))
        .groupBy(col("subspace"), col("cell_id"), col("dim"))
        .agg((sum(bround(col("v").cast("double"), 9).cast("decimal(18,9)"))
          .cast("double") / count(lit(1))).as("c"))
        .groupBy(col("subspace"), col("cell_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("c")))),
          s => s.getField("c").cast("float")).as("centroid"))
      // empty-cell fallback: a cell that lost every member keeps its
      // previous centroid (lloyd's contract — dropping would shrink k)
      cb = materialize(cb
        .select(col("subspace"), col("cell_id"), col("centroid").as("prev"))
        .join(next.select(col("subspace"), col("cell_id"),
          col("centroid").as("nxt")), Seq("subspace", "cell_id"), "left")
        .select(col("subspace"), col("cell_id"),
          coalesce(col("nxt"), col("prev")).as("centroid"))
        .coalesce(1))
    }
    cb
  }

  /** The codebook collapsed to ONE broadcastable row:
    * cb = array of (subspace, cell_id, centroid) structs, sorted — the
    * packed-centroid pattern of [[Clustering.assign]] lifted to m
    * subspaces. */
  private def packed(codebook: DataFrame): DataFrame =
    codebook
      .agg(sort_array(collect_list(struct(col("subspace"), col("cell_id"),
        col("centroid")))).as("cb"))

  /** Per-subspace argmin of l2 distance between a subvector slice and
    * that subspace's centroids — lexicographic struct min, ties to the
    * smaller cell_id (exactly [[Clustering.assign]]'s contract).
    */
  private def codeFor(vec: Column, cb: Column, j: Column, dsub: Int): Column =
    array_min(transform(
      filter(cb, c => c.getField("subspace") === j &&
        c.getField("centroid").isNotNull),
      c => struct(
        l2sqF(slice(vec, j * lit(dsub) + 1, lit(dsub)),
          c.getField("centroid")).as("d2"),
        c.getField("cell_id").as("cell_id")))).getField("cell_id")

  /** Encode the corpus: appends `codes` (array<int>, length m) — one
    * scan, zero shuffle, the codebook rides as one broadcast row.
    */
  def encode(corpus: DataFrame, codebook: DataFrame, m: Int,
      dsub: Int): DataFrame =
    corpus
      .crossJoin(broadcast(packed(codebook)))
      .withColumn("codes",
        transform(sequence(lit(0), lit(m - 1)),
          j => codeFor(col("embedding"), col("cb"), j, dsub).cast("int")))
      .drop("cb")

  /** Reconstruction: codes → concatenated centroids (the quantized
    * vector). PqSpec bounds the corpus mean squared reconstruction
    * error by the trivial one-centroid quantizer's.
    */
  def reconstruct(encoded: DataFrame, codebook: DataFrame, m: Int): DataFrame =
    encoded
      .crossJoin(broadcast(packed(codebook)))
      .withColumn("recon",
        flatten(transform(sequence(lit(0), lit(m - 1)), j =>
          element_at(
            filter(col("cb"), c => c.getField("subspace") === j &&
              c.getField("cell_id") === element_at(col("codes"), j + 1)),
            1).getField("centroid"))))
      .drop("cb")

  /** ADC top-k: each query precomputes its m×k partial-distance table
    * against the broadcast codebook (adc = array per subspace of
    * array per cell of l2sq(query slice, centroid)), then every
    * encoded row scores as m lookups summed — approximate l2, exact
    * ranking of the approximation (ties to the smaller vec_id). The
    * production pattern reranks the ADC shortlist exactly
    * ([[Similarity.topKCosine]] on the shortlist ids); PqSpec measures
    * shortlist recall on the worst case (random vectors).
    */
  def adcTopK(encoded: DataFrame, codebook: DataFrame, queries: DataFrame,
      k: Int, m: Int, dsub: Int, numCells: Int): DataFrame = {
    val tables = queries
      .crossJoin(broadcast(packed(codebook)))
      .withColumn("adc",
        transform(sequence(lit(0), lit(m - 1)), j =>
          transform(sequence(lit(0), lit(numCells - 1)), c =>
            l2sqF(slice(col("query_vec"), j * lit(dsub) + 1, lit(dsub)),
              element_at(
                filter(col("cb"), cb => cb.getField("subspace") === j &&
                  cb.getField("cell_id") === c),
                1).getField("centroid")))))
      .select(col("query_id"), col("adc"))
    val scored = encoded.select(col("vec_id"), col("codes"))
      .join(broadcast(tables), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(
          zip_with(col("codes"), col("adc"),
            (code, table) => element_at(table, code + 1)),
          lit(0.0), (acc, x) => acc + x).as("adc_d2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
