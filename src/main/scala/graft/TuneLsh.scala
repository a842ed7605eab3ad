package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.model.Tables

/** Scratch tuner (not shipped): find (numTables, planesPerTable) whose
  * LSH near-dup output equals the exact pair set on the shipped corpora.
  */
object TuneLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, sf)
      val exact = Similarity.cosineNearDupPairs(emb, 0.4)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"== $sf exact pairs: ${exact.size}")
      for (r <- Seq(3, 4); l <- Seq(8, 12, 16, 24, 32)) {
        val t0 = System.nanoTime()
        val lsh = Similarity.cosineNearDupPairsLsh(emb, 0.4,
            numTables = l, planesPerTable = r)
          .select("a_id", "b_id").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val miss = exact -- lsh
        println(f"r=$r L=$l%2d lsh=${lsh.size}%3d missing=${miss.size}%2d extra=${(lsh -- exact).size} $secs%.1fs")
      }
    }
    spark.stop()
  }
}
