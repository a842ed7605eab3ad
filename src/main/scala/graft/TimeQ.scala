package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Local per-query timer (builder tool, like [[TuneMinhash]]): times the
  * named registered queries against a data dir under driver-like
  * conditions (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus),
  * after a warm pass of the same queries at the SAME dir — the
  * steady-state warm-up discipline [[Bench]] uses (r8), so numbers
  * here track the driver's.
  * Also reports jobs/stages/tasks per timed run — at the test scales
  * most queries are scheduling-bound, so these counts predict
  * driver-condition cost better than local wall time does.
  *
  * Usage: runMain graft.TimeQ <sfDir> q_a,q_b,...
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(",")} (see SparkEntry.queries)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong(0); val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(): Unit
        tasks.addAndGet(s.stageInfo.numTasks): Unit
      }
    })
    // same boundary discipline as Bench (shared helper): warm-pass
    // (and prior timed queries') checkpoint blocks are released
    // synchronously OUTSIDE the timers, so async ContextCleaner work
    // never bills a measurement
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count(): Unit
      catch { case scala.util.control.NonFatal(e) =>
        // loud: the timed pass below will throw on the same query
        System.err.println(s"[timeq] WARM-PASS FAILURE $n: " +
          s"${e.getClass.getName}: ${e.getMessage}")
      }
      Bench.releaseCheckpoints(spark)
    }
    names.foreach { n =>
      org.apache.spark.GraftListenerBridge.drainListenerBus(
        spark.sparkContext, 10000)
      val j0 = jobs.get(); val s0 = stages.get(); val t0c = tasks.get()
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerBridge.drainListenerBus(
        spark.sparkContext, 10000)
      println(f"TIMEQ $n $sec%.2f s rows=$c jobs=${jobs.get() - j0} " +
        f"stages=${stages.get() - s0} tasks=${tasks.get() - t0c}")
      Bench.releaseCheckpoints(spark)
    }
    spark.stop()
  }
}
