package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Ranking

/** Hand-computed 2-D skyline semantics: strict-dominance rules, ties on
  * either and both axes, and the degenerate single-group cases.
  */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sky(rows: Seq[(Long, Double, Int)]): Set[Long] =
    Ranking.skyline(rows.toDF("id", "cost", "gain"),
        col("cost"), col("gain"), Seq(col("id")))
      .select("id").as[Long].collect().toSet

  test("skyline: strictly dominated rows drop; the frontier chain " +
      "survives") {
    // (1) c=1 g=10 and (2) c=3 g=20 are the frontier; (3) c=3 g=15 is
    // dominated by 2 (equal cost, less gain); (4) c=5 g=5 dominated by
    // everything cheaper-and-larger
    val rows = Seq((1L, 1.0, 10), (2L, 3.0, 20), (3L, 3.0, 15),
      (4L, 5.0, 5))
    assert(sky(rows) == Set(1L, 2L))
  }

  test("skyline: equal cost AND equal gain — mutual non-dominance, " +
      "both survive; equal gain at higher cost is dominated") {
    val rows = Seq((1L, 2.0, 7), (2L, 2.0, 7), // exact tie: both stay
      (3L, 4.0, 7)) // same gain, strictly pricier: dominated by 1/2
    assert(sky(rows) == Set(1L, 2L))
  }

  test("skyline: monotone-increasing gain over increasing cost keeps " +
      "everything; monotone-decreasing keeps only the cheapest") {
    val inc = (1L to 5L).map(i => (i, i.toDouble, i.toInt))
    assert(sky(inc) == (1L to 5L).toSet)
    val dec = (1L to 5L).map(i => (i, i.toDouble, 10 - i.toInt))
    assert(sky(dec) == Set(1L))
  }

  test("skyline: single row survives; empty input is empty") {
    assert(sky(Seq((9L, 1.5, 3))) == Set(9L))
    assert(sky(Seq.empty) == Set.empty)
  }
}
