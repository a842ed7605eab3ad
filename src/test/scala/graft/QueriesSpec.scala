package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract smoke over the whole registry: every declared query runs on
  * sf0.001 and yields rows; every oracle key has a query; entry > 0.
  * (Value-level correctness is the driver's DuckDB gate, mirrored
  * locally by tools/compare_oracle.py.)
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every oracle key has a matching query") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracle entries without queries: $orphan")
  }

  test("the bench baseline subset is fully registered — retiring one " +
      "of the 60 round-1 survivors would silently shrink the window-" +
      "invariant denominator, so it must fail here instead") {
    val missing = Bench.BaselineSubset -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"baseline-subset queries not in the " +
      s"registry: $missing — update Bench.BaselineSubset deliberately " +
      "(and note it in COVERAGE.md) if a retirement is intended")
    assert(Bench.BaselineSubset.size == 60)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, TestSpark.Sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("q_approx_distinct golden estimates (deterministic HLL++ — " +
      "pinned at both test scales; the constants MUST equal the ones " +
      "in ExtQueries.oracles)") {
    // Spark's HLL++ sketch is an order-independent function of the
    // distinct value SET, so the estimate is a fixture constant. A
    // fixture regeneration breaks this pin and the oracle's
    // fingerprint key together (the q_similarity_ann discipline).
    def est(sf: String): (Long, Long) = {
      val r = SparkEntry.queries("q_approx_distinct")(spark, sf).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(est(TestSpark.Sf0001) == ((1379L, 195L)))
    val sf001 = "/root/testdata/sf0.01"
    if (new java.io.File(sf001).isDirectory)
      assert(est(sf001) == ((14206L, 1947L)))
    val sql = SparkEntry.oracleSql("q_approx_distinct")
    // full CAST tokens, not bare digits: "19522" contains "195" as a
    // substring, so a bare-digit check could pass with a branch edited
    for (c <- Seq(1379, 195, 14206, 1947, 144569, 19522))
      assert(sql.contains(s"CAST($c AS BIGINT)"),
        s"oracle missing pinned constant $c")
  }

  test("q_approx_distinct pinned estimates are ACCURATE, not just " +
      "replayed: each is within 3x the default HLL++ rsd (0.05) of " +
      "the exact distinct count (ADVICE r12 — the replay pin alone " +
      "verifies determinism, not correctness)") {
    // The pinned constants are Spark-version-dependent (they are
    // Spark's own HLL++ output on these fixtures; an upgrade changing
    // sketch internals or the default rsd moves them — loudly, at the
    // replay pin). THIS test is version-portable: it bounds the
    // estimates against ground truth, so it tells a constant-drift
    // failure (replay pin red, this green) apart from a genuinely
    // broken sketch (both red).
    import org.apache.spark.sql.functions.{col, countDistinct}
    def bound(sf: String, pinnedOrders: Long, pinnedParts: Long): Unit = {
      val r = graft.model.Tables.lineitem(spark, sf)
        .agg(countDistinct(col("l_orderkey")),
          countDistinct(col("l_partkey"))).collect()(0)
      val (exactO, exactP) = (r.getLong(0), r.getLong(1))
      assert(math.abs(pinnedOrders - exactO).toDouble / exactO <= 0.15,
        s"approx_orders $pinnedOrders vs exact $exactO at $sf")
      assert(math.abs(pinnedParts - exactP).toDouble / exactP <= 0.15,
        s"approx_parts $pinnedParts vs exact $exactP at $sf")
    }
    bound(TestSpark.Sf0001, 1379L, 195L)
    val sf001 = "/root/testdata/sf0.01"
    if (new java.io.File(sf001).isDirectory) bound(sf001, 14206L, 1947L)
    val sf01 = "/root/testdata/sf0.1"
    if (new java.io.File(sf01).isDirectory) bound(sf01, 144569L, 19522L)
  }
}
