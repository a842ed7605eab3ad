package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Curation
import graft.model.Tables

/** Corpus-assembly operators (train/test split, mixing cap, sequence
  * packing, decontamination): the properties a training-data pipeline
  * actually relies on, beyond the per-value oracle checks.
  */
class AssemblySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, TestSpark.Sf0001)

  test("train/test split is stable under corpus growth: a doc never " +
      "switches sides when more docs arrive") {
    val half = docs.filter(col("doc_id") < 250)
    val splitHalf = Curation.trainTestSplit(half, "doc_id", 0.2)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val splitFull = Curation.trainTestSplit(docs, "doc_id", 0.2)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(splitHalf.forall { case (id, s) => splitFull(id) == s })
    // the realized fraction tracks the requested one (hash uniformity)
    val frac = splitFull.values.count(_ == "test").toDouble / splitFull.size
    assert(frac > 0.1 && frac < 0.3, s"test fraction $frac far from 0.2")
  }

  test("train/test split boundaries: frac 0 puts nothing in test, " +
      "frac 1 puts everything") {
    assert(Curation.trainTestSplit(docs, "doc_id", 0.0)
      .filter(col("split") === "test").isEmpty)
    assert(Curation.trainTestSplit(docs, "doc_id", 1.0)
      .filter(col("split") === "train").isEmpty)
  }

  test("mixing cap keeps at most cap docs per source and keeps the best") {
    val capped = Curation.mixingCap(docs, "source", "doc_id", col("n_chars"), 10)
    val perSource = capped.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(perSource.values.forall(_ <= 10))
    // kept min n_chars per source >= dropped max (with id tiebreak slack:
    // compare against strictly-smaller dropped values only)
    val keptMin = capped.groupBy("source").agg(min("n_chars").as("m"))
      .as[(String, Long)].collect().toMap
    val dropped = docs.join(capped.select("doc_id"), Seq("doc_id"), "left_anti")
    val dropMax = dropped.groupBy("source").agg(max("n_chars").as("m"))
      .as[(String, Long)].collect().toMap
    dropMax.foreach { case (src, dm) =>
      assert(dm <= keptMin(src), s"dropped a better doc than kept for $src")
    }
  }

  test("sequence packing: cumulative layout is gapless per group and " +
      "every sequence except the last holds >= budget of started tokens") {
    val budget = 2048
    val packed = Curation.packSequences(docs, "text", "doc_id", "lang", budget)
    // every doc's start offset lies inside its assigned sequence
    val bad = packed.filter(
      col("seq_id") =!= floor((col("cum") - col("n_tokens")) / lit(budget)))
    assert(bad.isEmpty)
    // seq ids per group are contiguous from 0 (no empty sequences)
    val groups = packed.groupBy("lang")
      .agg(max("seq_id").as("mx"), countDistinct("seq_id").as("n"))
      .as[(String, Long, Long)].collect()
    groups.foreach { case (lang, mx, n) =>
      assert(n == mx + 1, s"gap in seq ids for $lang")
    }
  }

  test("weighted repetition: integer weights are exact, fractional " +
      "weights track in expectation, weight 0 drops the source") {
    val out = Curation.repeatByWeight(docs, "source", "doc_id",
      Map("src0" -> 3.0, "src1" -> 0.5, "src2" -> 0.0))
    val bySource = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val orig = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource("src0") == 3 * orig("src0")) // exact integer repeat
    assert(!bySource.contains("src2"))           // weight 0 drops all
    val f = bySource("src1").toDouble / orig("src1")
    assert(f > 0.2 && f < 0.8, s"fraction $f far from 0.5")
    assert(bySource("src3") == orig("src3"))     // default weight 1
    // deterministic: same output on recompute
    assert(out.count() == Curation.repeatByWeight(docs, "source", "doc_id",
      Map("src0" -> 3.0, "src1" -> 0.5, "src2" -> 0.0)).count())
  }

  test("decontamination: flagged set equals a brute-force shingle " +
      "overlap count, and cleaned corpus has no flagged doc") {
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val flagged = Curation.contaminatedDocs(corpus, bench, "text", "doc_id",
        n = 3, minOverlap = 5)
      .as[(Long, Long)].collect().toMap

    // brute force on the driver (small corpus)
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val benchSh = bench.select("text").as[String].collect()
      .flatMap(shingles).toSet
    val expect = corpus.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> shingles(t).count(benchSh.contains).toLong }
      .filter(_._2 >= 5).toMap
    assert(flagged == expect)

    val cleaned = corpus.join(
      Curation.contaminatedDocs(corpus, bench, "text", "doc_id", 3, 5)
        .select("doc_id"), Seq("doc_id"), "left_anti")
    assert(cleaned.count() == corpus.count() - flagged.size)
  }
}
