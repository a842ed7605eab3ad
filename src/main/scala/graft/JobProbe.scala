package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Per-job attribution probe (builder tool, r16 — the action-count
  * companion of [[TimeQ]]): runs the named registered queries once warm,
  * then once instrumented, printing one line per Spark job with its
  * stage/task counts and submitting call site — the data for deciding
  * which eager actions (checkpoints, convergence counts, broadcast
  * builds) a loop actually pays for.
  *
  * Usage: runMain graft.JobProbe <sfDir> q_a,q_b,...
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (capture) {
          val cs = Option(j.properties.getProperty("callSite.short"))
            .getOrElse("")
          jobs.add(s"job=${j.jobId} stages=${j.stageInfos.size} " +
            s"tasks=${j.stageInfos.map(_.numTasks).sum} site=$cs"): Unit
        }
    })
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count(): Unit
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[jobprobe] WARM-PASS FAILURE $n: ${e.getMessage}")
      }
      Bench.releaseCheckpoints(spark)
    }
    names.foreach { n =>
      org.apache.spark.GraftListenerBridge.drainListenerBus(
        spark.sparkContext, 10000)
      jobs.clear()
      capture = true
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerBridge.drainListenerBus(
        spark.sparkContext, 10000)
      capture = false
      println(f"JOBPROBE $n $sec%.2f s rows=$c jobs=${jobs.size}")
      jobs.forEach(s => println(s"  JP $n $s"))
      Bench.releaseCheckpoints(spark)
    }
    spark.stop()
  }
}
