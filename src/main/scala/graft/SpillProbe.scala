package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.ext.Similarity
import graft.model.Tables

/** Forced-spill probe, run in its OWN JVM (ScaleSpec launches it as a
  * subprocess): `spark.shuffle.spill.numElementsForceSpillThreshold` is
  * a SparkConf the shuffle sorter reads at context creation, so it
  * cannot be flipped on the suite's shared session. With the threshold
  * lowered to 1000 records and 2 shuffle partitions, every exchange in
  * the sign-LSH near-dup join spills repeatedly — the memory-pressure
  * regime the sf0.1 bench never reaches — and the probe asserts the
  * LSH pair set still equals the exact-cosine pair set, then prints
  * one JSON line with the observed spill totals for the spec to check
  * (nonzero spill, equal results).
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spill-probe")
      .config("spark.sql.shuffle.partitions", "2")
      // ≤ bypassMergeThreshold reduce partitions would pick the bypass
      // writer, which streams straight to per-partition files and never
      // spills; threshold 0 keeps the sort-based writer in play so the
      // force-spill threshold actually bites
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled): Unit
          diskSpill.addAndGet(m.diskBytesSpilled): Unit
        }
      }
    })
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = Tables.embeddings(spark, sfDir)
    val lsh = pairs(Similarity.cosineNearDupPairsLsh(emb,
      threshold = 0.4, numTables = 24, planesPerTable = 3))
    val exact = pairs(Similarity.cosineNearDupPairs(emb, 0.4))
    org.apache.spark.GraftListenerBridge.drainListenerBus(
      spark.sparkContext, 10000)
    val line =
      s"""{"spill_bytes":${memSpill.get()},""" +
      s""""disk_spill_bytes":${diskSpill.get()},""" +
      s""""lsh_pairs":${lsh.size},"exact_pairs":${exact.size},""" +
      s""""equal":${lsh == exact}}"""
    spark.stop()
    println(line)
  }
}
