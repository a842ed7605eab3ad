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
}
