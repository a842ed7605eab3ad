package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Clustering
import graft.model.Tables

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, TestSpark.Sf0001).cache()

  test("assign: every vector lands on exactly one cell; a seed vector on itself") {
    val cents = Clustering.seedCentroids(emb, 4)
    val a = Clustering.assign(emb, cents).cache()
    assert(a.count() == emb.count())
    assert(a.select("vec_id").distinct().count() == emb.count())
    // the seed vectors ARE centroids: distance 0 to their own cell
    val seedIds = emb.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id")).as[Long].collect().toSet
    val selfAssigned = a.filter(col("vec_id").isin(seedIds.toSeq: _*))
      .select(col("d2")).as[Double].collect()
    assert(selfAssigned.forall(_ == 0.0))
  }

  test("assign ties break toward the smaller cell_id") {
    val vecs = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cents = Seq((1, Array(1.0f, 1.0f)), (0, Array(1.0f, -1.0f)))
      .toDF("cell_id", "centroid")
    val cell = Clustering.assign(vecs, cents)
      .select(col("cell_id")).as[Int].head()
    assert(cell == 0) // both centroids at d2 = 1.0 — smaller id wins
  }

  test("centroidStats means match a hand-computed two-vector cell") {
    val vecs = Seq(
      (1L, Array(1.0f, 3.0f)), (2L, Array(3.0f, 5.0f))).toDF("vec_id", "embedding")
    val cents = Seq((0, Array(0.0f, 0.0f))).toDF("cell_id", "centroid")
    val stats = Clustering.centroidStats(Clustering.assign(vecs, cents))
      .orderBy("dim").select("n", "centroid").as[(Long, Double)].collect()
    assert(stats.toSeq == Seq((2L, 2.0), (2L, 4.0)))
  }

  test("lloyd: inertia never increases across iterations") {
    val seeds = Clustering.seedCentroids(emb, 6)
    val i0 = Clustering.inertia(emb, seeds)
    val c1 = Clustering.lloyd(emb, 6, iters = 1)
    val i1 = Clustering.inertia(emb, c1)
    val c3 = Clustering.lloyd(emb, 6, iters = 3)
    val i3 = Clustering.inertia(emb, c3)
    assert(i1 <= i0, s"one Lloyd step must not increase inertia ($i1 > $i0)")
    assert(i3 <= i1 + 1e-9, s"more steps must not increase inertia ($i3 > $i1)")
  }

  test("lloyd keeps k centroids even when a cell empties") {
    // 3 tight points, k=2 seeded on the first two: cell 1's centroid
    // moves to the data mean only if it keeps members; either way the
    // result must still have k rows with non-null centroids.
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.01f, 0.0f)),
      (3L, Array(0.02f, 0.0f))).toDF("vec_id", "embedding")
    val c = Clustering.lloyd(vecs, 2, iters = 3).cache()
    assert(c.count() == 2)
    assert(c.filter(col("centroid").isNull).count() == 0)
  }

  test("lloyd is deterministic: two runs produce identical centroids") {
    val a = Clustering.lloyd(emb, 5, iters = 2)
      .orderBy("cell_id").select("centroid").as[Array[Float]].collect()
    val b = Clustering.lloyd(emb, 5, iters = 2)
      .orderBy("cell_id").select("centroid").as[Array[Float]].collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }
}
