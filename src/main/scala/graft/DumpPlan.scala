package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Prints the formatted physical plan of the named registered queries
  * (all of them with no args) — the source for PLANS.md entries.
  *
  * Usage: runMain graft.DumpPlan [queryName ...]
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val mode = ExplainMode.fromString("formatted")
    names.foreach { n =>
      println(s"\n## $n\n")
      println("```")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(mode).trim)
      println("```")
    }
    spark.stop()
  }
}
