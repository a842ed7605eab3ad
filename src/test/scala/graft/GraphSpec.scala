package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Graph

/** PageRank semantics on graphs with known closed-form behavior. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)], iters: Int = 3): Map[Long, Double] =
    Graph.pageRank(pairs.toDF("a_id", "b_id"), "a_id", "b_id", iters)
      .as[(Long, Double)].collect().toMap

  test("star graph: the hub outranks every leaf; ranks sum to ~1") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val r = ranks(star)
    assert(r.size == 5)
    assert((1L to 4L).forall(l => r(0L) > r(l)), r.toString)
    // leaves are symmetric ⇒ identical ranks (bit-identical: decimal-
    // rounded contributions make the sum order-independent)
    assert((2L to 4L).forall(l => r(l) == r(1L)), r.toString)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r.values.sum.toString)
  }

  test("ring graph: perfect symmetry gives every node exactly 1/N " +
      "at any iteration count") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    for (it <- Seq(1, 5)) {
      val r = ranks(ring, it)
      assert(r.size == 4)
      // uniform is the fixed point; each iteration reproduces it up to
      // the decimal contribution rounding (≤ 2 ulps of drift)
      r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12, r.toString))
    }
  }

  test("two disjoint components rank independently; empty input is empty") {
    val two = Seq((1L, 2L), (10L, 11L), (10L, 12L))
    val r = ranks(two)
    assert(r.size == 5)
    // the pair component is symmetric, the star's hub dominates it
    assert(r(1L) == r(2L))
    assert(r(10L) > r(11L) && r(11L) == r(12L))
    assert(Graph.pageRank(
      Seq.empty[(Long, Long)].toDF("a_id", "b_id"), "a_id", "b_id").isEmpty)
  }
}
