package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Driver-run benchmark: one JSON line of per-query seconds over
  * SparkEntry.queries at SPARK_GRAFT_SF_DIR (default sf0.1), plus
  * per-query shuffle-write and spill totals (a task-metrics listener) —
  * the two numbers that predict how a plan behaves at 100 TB better
  * than local wall time does.
  */
object Bench {

  /** Deterministic inter-query cleanup, run OUTSIDE any timed window:
    * localCheckpoint blocks from a finished query otherwise linger in
    * the block manager until the ContextCleaner notices the dropped
    * references on some later GC — background work that then bills
    * whichever queries happen to run next (the consecutive slow windows
    * measured in r7). Unpersisting synchronously between queries pins
    * that cost to the boundary, not the next measurement. Shared with
    * [[TimeQ]] so the builder tool's boundary discipline cannot drift
    * from the driver bench's.
    */
  private[graft] def releaseCheckpoints(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.sharedState.cacheManager.clearCache()
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Running totals of shuffle-write bytes, spill, task-observed GC
    // time, and job submissions across all tasks; per-query values are
    // before/after deltas (queries run serially). GC-ms and job counts
    // are the r8 contention diagnostics: both the r7 driver run and a
    // local r8 run showed a CONSECUTIVE window of inflated queries
    // (driver: positions 30-34, +1.4-4.5 s each; local: 78-82) right
    // after the heaviest localCheckpoint queries — environment noise
    // concentrated by GC/cleanup debt, not plan cost. Per-query gc_ms
    // makes that attribution visible in the detail file.
    val shuffleBytes = new AtomicLong(0L)
    val spillBytes = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    val jobCount = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
          spillBytes.addAndGet(m.memoryBytesSpilled): Unit
          gcMs.addAndGet(m.jvmGCTime): Unit
        }
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(): Unit
      }
    })

    // Warm the session (JVM/codegen/committer init, parquet footers)
    // so measured numbers reflect plans, not first-hit JIT: r5/r6
    // driver-vs-builder totals swung 35-45% on cold-start-shaped
    // deltas — r6's broad +0.3-2 s inflation hit ~20 ZERO-SHUFFLE
    // trivial queries, i.e. fixed per-shape cost (janino codegen
    // compile + C2 JIT on each query's generated classes), not plan
    // cost. Warm-up runs EVERY registered query once at the MEASURED
    // sfDir (steady-state measurement, the JMH discipline): r8 measured
    // that warming at sf0.001 leaves a one-time +0.5-1.0 s residual on
    // each complex-plan query in the first measured pass (second-tier
    // C2 compilation only triggers at real data volume, and sf0.001
    // plans can pick different join strategies than the measured scale)
    // — first-run total 51.8 s vs 40.1/41.6 s steady on identical code.
    // The extra warm pass costs ~40 s once, outside every timer.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count(): Unit }
      catch { case scala.util.control.NonFatal(_) => () }
      // release per warm query — at-scale checkpoint blocks from all 90
      // queries would otherwise accumulate across the whole warm pass
      // (block-manager pressure the timed loop never sees, since it
      // releases at every boundary)
      releaseCheckpoints(spark)
    }
    // in-flight warm-up task events would otherwise land AFTER the
    // first query's counter snapshot and inflate its deltas
    org.apache.spark.GraftListenerBridge.drainListenerBus(
      spark.sparkContext, 10000)

    case class R(sec: Double, shuffleMb: Double, spillMb: Double,
      gcMs: Long, jobs: Long)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val s0 = shuffleBytes.get(); val p0 = spillBytes.get()
      val g0 = gcMs.get(); val j0 = jobCount.get()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case scala.util.control.NonFatal(_) => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are delivered async; drain the bus so the
      // delta lands on the query that caused it
      org.apache.spark.GraftListenerBridge.drainListenerBus(
        spark.sparkContext, 10000)
      val r = R(sec,
        (shuffleBytes.get() - s0) / 1e6, (spillBytes.get() - p0) / 1e6,
        gcMs.get() - g0, jobCount.get() - j0)
      releaseCheckpoints(spark)
      name -> r
    }
    def num(v: Double, dp: Int): String =
      BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.toPlainString
    def m1(f: R => Double, dp: Int): String = results
      .map { case (k, r) => "\"" + k + "\":" + num(f(r), dp) }
      .mkString("{", ",", "}")
    val total = results.values.map(_.sec).sum
    // Full-resolution record (timings + the shuffle/spill/gc/job maps
    // that predict 100 TB behavior and attribute contention) goes to a
    // FILE: the driver's stdout capture keeps only the last ~2000
    // chars, so anything bulky on stdout would truncate the
    // machine-readable line below.
    val detail =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec",""" +
      s""""queries":${m1(_.sec, 3)},"shuffle_mb":${m1(_.shuffleMb, 3)},""" +
      s""""spill_mb":${m1(_.spillMb, 3)},"gc_ms":${m1(_.gcMs.toDouble, 0)},""" +
      s""""jobs":${m1(_.jobs.toDouble, 0)},"sf":"$sfDir"}"""
    val detailPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json") // cwd-relative default
    def writeFile(path: String): Unit =
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(path),
          (detail + "\n").getBytes("UTF-8")): Unit
      } catch { // detail files are best-effort, but fatals must propagate
        case scala.util.control.NonFatal(_) => ()
      }
    writeFile(detailPath)
    // Round-stamped copy (BENCH_DETAIL_r{N}.json): BENCH_DETAIL.json is
    // overwritten per run, which lost rounds 1-4's per-query history.
    // The round is inferred from the driver's own BENCH_r{K}.json files
    // in cwd (this run belongs to round max(K)+1); driver runs execute
    // in /root/repo where those exist, builder runs that set an
    // explicit detail path skip the copy. A stray no-env re-run AFTER
    // the driver has recorded BENCH_r{N} would stamp itself r{N+1} —
    // accepted: the real round-N+1 run overwrites that file (last
    // writer wins), so a mislabel is transient, and builder tooling
    // always sets SPARK_GRAFT_BENCH_DETAIL.
    if (!sys.env.contains("SPARK_GRAFT_BENCH_DETAIL")) {
      val rounds = Option(new java.io.File(".").listFiles()).toSeq.flatten
        .flatMap(f => "^BENCH_r(\\d+)\\.json$".r
          .findFirstMatchIn(f.getName).map(_.group(1).toInt))
      if (rounds.nonEmpty)
        writeFile(f"BENCH_DETAIL_r${rounds.max + 1}%02d.json")
    }
    // Final stdout line: total + ONLY the top-10 slowest queries. The
    // driver keeps just the last ~2000 stdout chars; a full per-query
    // map crossed that at ~85 queries and silently became parsed:null
    // (rounds 1-4 are unrecoverable for exactly this reason). Top-10 +
    // count stays ~500 chars at any registry size.
    val top10 = results.toSeq.sortBy(-_._2.sec).take(10)
    val topJson = top10
      .map { case (k, r) => "\"" + k + "\":" + num(r.sec, 2) }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${num(total, 2)},"unit":"sec",""" +
      s""""n_queries":${results.size},"queries":$topJson,"sf":"$sfDir"}"""
    // Stop the session BEFORE printing: shutdown logging then cannot
    // interleave after the JSON, so the line is the last thing on
    // stdout for the driver's parser.
    spark.stop()
    println(line)
  }
}
