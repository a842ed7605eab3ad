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
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_NO_AUTO_BROADCAST=1 disables size-based broadcast
    // selection (threshold -1) so a plan diff against the default run
    // reveals exactly which joins RELY on auto-broadcast at bench scale
    // versus carrying an explicit broadcast()/hint — the r16
    // 100 TB-planner audit. Builder tool knob; the bench never sets it.
    if (sys.env.get("SPARK_GRAFT_NO_AUTO_BROADCAST").contains("1"))
      builder.config("spark.sql.autoBroadcastJoinThreshold", "-1"): Unit
    val spark = builder.getOrCreate()
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
