package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Dedup
import graft.model.Tables

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.Sf0001).cache()

  test("exact dedup groups: one group per distinct text, min id kept") {
    val texts = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(texts, "text", "doc_id")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(g.length == 2)
    assert(g.head._2 == 1L && g.head._3 == 2L) // "a b c" kept id 1, 2 copies
    assert(g(1)._2 == 3L && g(1)._3 == 1L)
  }

  test("shingleSets drops docs shorter than n tokens") {
    val texts = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val s = Dedup.shingleSets(texts, "text", "doc_id", 3)
      .as[(Long, Seq[String])].collect().toMap
    assert(!s.contains(1L))
    assert(s(2L).toSet == Set("a b c", "b c d"))
  }

  test("minhash LSH pairs equal exact ngram-jaccard pairs at J>=0.8 " +
      "(recall ~1 at b=16,r=4)") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDupPairs(docs, "text", "doc_id", 3, 64, 16, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh == exact)
  }

  test("prefix-filtered jaccard join equals the naive inverted-index join") {
    for (t <- Seq(0.6, 0.8)) {
      val naive = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      val prefix = Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id", 3, t)
        .as[(Long, Long, Double)].collect().toSet
      assert(prefix == naive, s"threshold $t")
      assert(naive.nonEmpty)
    }
  }

  test("jaccard is symmetric-by-construction and bounded in (0,1]") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall { case (a, b, j) => a < b && j > 0.0 && j <= 1.0 })
  }

  test("identical docs get identical simhash; disjoint docs differ") {
    val texts = Seq(
      (1L, "spark join merge sort batch"),
      (2L, "spark join merge sort batch"),
      (3L, "completely different words entirely here")).toDF("doc_id", "text")
    val fp = Dedup.simhash(texts, "text", "doc_id").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("simhash chunk blocking finds all identical-doc pairs (hamming 0)") {
    val texts = Seq(
      (1L, "spark join merge sort batch"),
      (2L, "spark join merge sort batch"),
      (3L, "alpha beta gamma delta eps")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(texts, "text", "doc_id", 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
  }

  test("dedup is idempotent: re-running exactGroups on deduped output " +
      "yields singleton groups") {
    val texts = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val kept = Dedup.exactGroups(texts, "text", "doc_id")
      .join(texts, col("keep_id") === col("doc_id"))
      .select("doc_id", "text")
    val again = Dedup.exactGroups(kept, "text", "doc_id")
    assert(again.filter(col("n_copies") > 1).isEmpty)
  }

  test("connected components merge transitively — including the case " +
      "pairwise b-drop misses (all neighbors of a non-min node larger)") {
    // components: {1,2,5} via (1,5),(2,5) — node 2's only neighbor is 5,
    // so pairwise drop would keep 2; CC groups it under 1 — and {7,8}
    val pairs = Seq((1L, 5L), (2L, 5L), (7L, 8L)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("connected components: long chain converges (diameter > 2), " +
      "empty pair set yields empty output") {
    val chain = (1L to 9L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(chain, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(cc == (1L to 9L).map(_ -> 1L).toMap)
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponents(empty, "a_id", "b_id").isEmpty)
  }
}
