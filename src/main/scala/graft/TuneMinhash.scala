package graft

import org.apache.spark.sql.SparkSession
import graft.ext.Dedup
import graft.model.Tables

/** Scratch tuner (not shipped): measure MinHash-LSH configs against the
  * exact J ≥ 0.8 pair set on the shipped corpora — candidate volume,
  * recall, and wall time — to pick (numPerms, bands) for
  * `q_dedup_minhash`. Keep only configs whose FINAL pair set equals the
  * exact set on BOTH sf0.01 and sf0.1 (the oracle demands it).
  */
object TuneMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, sf)
      val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.8)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"== $sf exact J>=0.8 pairs: ${exact.size}")
      for ((perms, bands) <- Seq((64, 16), (48, 16), (32, 16), (64, 32), (32, 8))) {
        val r = perms / bands
        val sets = Dedup.shingleSets(docs, "text", "doc_id", 3).localCheckpoint()
        val t0 = System.nanoTime()
        val nCands = Dedup.lshCandidates(
          Dedup.minhashSignatures(sets, perms), bands, r).count()
        val tCand = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val got = Dedup.minhashNearDupPairsFromSets(sets, perms, bands, 0.8)
          .select("a_id", "b_id").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        val tFull = (System.nanoTime() - t1) / 1e9
        val miss = exact -- got
        println(f"perms=$perms%2d b=$bands%2d r=$r cands=$nCands%6d " +
          f"pairs=${got.size}%3d missing=${miss.size}%2d " +
          f"cand=$tCand%5.1fs full=$tFull%5.1fs")
      }
      // hashed-basis variants (what the registered query ships):
      // exactness must hold for the shipped (48, 16) at both scales
      for ((perms, bands) <- Seq((48, 16), (64, 16))) {
        val hsets = Dedup.hashedShingleSets(docs, "text", "doc_id", 3)
          .localCheckpoint()
        val t0 = System.nanoTime()
        val got = Dedup.minhashNearDupPairsFromHashedSets(hsets, perms, bands, 0.8)
          .select("a_id", "b_id").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        val tFull = (System.nanoTime() - t0) / 1e9
        val miss = exact -- got
        println(f"HASHED perms=$perms%2d b=$bands%2d r=${perms / bands} " +
          f"pairs=${got.size}%3d missing=${miss.size}%2d full=$tFull%5.1fs")
      }
    }
    spark.stop()
  }
}
