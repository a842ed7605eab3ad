package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Clustering, Pq}
import graft.model.Tables

/** Product-quantization semantics (Jégou et al. 2011): code shape and
  * determinism, the reconstruction bound that makes PQ a quantizer
  * rather than a hash, and ADC shortlist recall — the production
  * search pattern (ADC scan → exact rerank).
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 8; private val Dsub = 8; private val K = 16
  private lazy val emb = Tables.embeddings(spark, TestSpark.Sf0001).cache()
  private lazy val cb = Pq.train(emb, M, Dsub, K,
    materialize = _.localCheckpoint())

  test("codebook shape: m×k centroids of dsub dims, every subspace full") {
    val rows = cb.select(col("subspace"), col("cell_id"),
      size(col("centroid"))).as[(Int, Int, Int)].collect()
    assert(rows.length == M * K)
    assert(rows.forall(_._3 == Dsub))
    assert(rows.map(r => (r._1, r._2)).toSet ==
      (for (j <- 0 until M; c <- 0 until K) yield (j, c)).toSet)
  }

  test("one-pass training equals m independent per-subspace lloyd " +
      "runs bit-exactly (the single-scan rewrite changed the schedule, " +
      "not the algorithm)") {
    val ref = (0 until M).map { j =>
      Clustering.lloyd(
          emb.select(col("vec_id"),
            slice(col("embedding"), j * Dsub + 1, Dsub).as("embedding")),
          K, iters = 1)
        .select(lit(j).as("subspace"), col("cell_id"), col("centroid"))
    }.reduce(_.unionByName(_))
      .as[(Int, Int, Seq[Float])].collect()
      .map { case (j, c, v) => ((j, c), v) }.toMap
    val got = cb.as[(Int, Int, Seq[Float])].collect()
      .map { case (j, c, v) => ((j, c), v) }.toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (key, v) =>
      assert(v == ref(key), s"codebook centroid $key diverged") }
  }

  test("codes: length m, values in [0, k), deterministic across " +
      "partitionings (the digest the gate pins is partition-free)") {
    def codesOf(df: org.apache.spark.sql.DataFrame) =
      Pq.encode(df, cb, M, Dsub)
        .select(col("vec_id"), col("codes")).as[(Long, Seq[Int])]
        .collect().toMap
    val base = codesOf(emb)
    assert(base.values.forall(c => c.length == M &&
      c.forall(x => x >= 0 && x < K)))
    assert(codesOf(emb.repartition(7)) == base)
    // and codes genuinely vary (a degenerate constant code table would
    // pass the shape checks while quantizing everything identically)
    assert(base.values.toSet.size > 100)
  }

  test("reconstruction: PQ mean squared error beats the one-centroid " +
      "(global mean) quantizer — the bound that separates a quantizer " +
      "from a hash") {
    val enc = Pq.encode(emb, cb, M, Dsub).localCheckpoint()
    val pqMse = Pq.reconstruct(enc, cb, M)
      .select(graft.functions.ArrayMath.l2sqF(col("embedding"),
        col("recon")).as("e"))
      .agg(avg(col("e"))).as[Double].head()
    // one-centroid baseline: every vector reconstructs to the mean
    val meanVec = emb
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim")).agg(avg(col("v")).as("mu"))
      .orderBy(col("dim")).as[(Int, Double)].collect().map(_._2.toFloat)
    val baseMse = emb
      .select(graft.functions.ArrayMath.l2sqF(col("embedding"),
        lit(meanVec)).as("e"))
      .agg(avg(col("e"))).as[Double].head()
    assert(pqMse < baseMse,
      f"PQ MSE $pqMse%.5f not below the global-mean MSE $baseMse%.5f")
    info(f"PQ MSE $pqMse%.5f vs global-mean MSE $baseMse%.5f " +
      f"(${baseMse / pqMse}%.2fx better)")
  }

  test("ADC shortlist recall: the top-50 ADC shortlist captures most " +
      "of the exact l2 top-10 on random vectors (the worst case), and " +
      "the ADC ordering is deterministic") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val enc = Pq.encode(emb, cb, M, Dsub)
      .select(col("vec_id"), col("codes")).localCheckpoint()
    val shortlist = Pq.adcTopK(enc, cb, queries, k = 50, M, Dsub, K)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact l2 top-10 per query (brute force on the fixture)
    val exact = queries.as("q")
      .join(emb.as("c"), col("q.query_id") =!= col("c.vec_id"))
      .select(col("q.query_id"), col("c.vec_id"),
        graft.functions.ArrayMath.l2sqF(col("q.query_vec"),
          col("c.embedding")).as("d2"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("d2").asc, col("vec_id"))))
      .filter(col("rk") <= 10)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.map { case (q, ids) => (ids & shortlist(q)).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    // measured 0.78 on this fixture (random 64-dim vectors — the
    // hardest case; m=8,k=16 is a 4-byte code). Floor well below the
    // measurement but far above chance (50/499 ≈ 0.1)
    assert(recall >= 0.4, f"ADC shortlist recall $recall%.2f too low")
    info(f"ADC top-50 shortlist recall of exact-l2 top-10: $recall%.2f")
  }

  test("q_embed_pq golden digests equal the oracle's pinned constants " +
      "at both test scales (fixture drift breaks spec and oracle " +
      "together)") {
    def digest(sf: String): (Long, Long) = {
      val r = SparkEntry.queries("q_embed_pq")(spark, sf).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (n1, d1) = digest(TestSpark.Sf0001)
    assert(n1 == 500L)
    val sql = SparkEntry.oracleSql("q_embed_pq")
    assert(sql.contains(d1.toString), s"sf0.001 digest $d1 not pinned")
    val sf001 = "/root/testdata/sf0.01"
    if (new java.io.File(sf001).isDirectory) {
      val (n2, d2) = digest(sf001)
      assert(n2 == 500L)
      assert(sql.contains(d2.toString), s"sf0.01 digest $d2 not pinned")
    }
  }
}
