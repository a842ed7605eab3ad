package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextHash
import graft.model.Tables

/** [[graft.functions.HashedWordShingles]] must equal the SQL
  * formulation it replaces — `sort_array(transform(array_distinct(
  * <split/concat_ws shingles>), xxhash64))` — byte-for-byte on every
  * input shape, because every count-based dedup operator now hashes
  * through it and the DuckDB oracles were validated against the SQL
  * path's hashes.
  */
class TextHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sqlShingles(n: Int) = {
    // the original formulation: split → filter → shingle strings →
    // distinct → hash → sort
    expr(s"""sort_array(transform(array_distinct(
      transform(sequence(0, size(split(text, ' ')) - $n),
        i -> concat_ws(' ', slice(split(text, ' '), i + 1, $n)))),
      s -> xxhash64(s)))""")
  }

  private def check(texts: Seq[String], n: Int): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .filter(size(split(col("text"), " ")) >= n) // the builder's gate
    val rows = df.select(col("doc_id"),
        sqlShingles(n).as("sql_shs"),
        TextHash.hashedShingles(col("text"), n).as("native_shs"))
      .collect()
    assert(rows.nonEmpty || texts.forall(_.split(" ", -1).length < n))
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: sql=${r.getSeq[Long](1)} native=${r.getSeq[Long](2)}")
    }
  }

  test("native shingle hashes equal the SQL formulation on the fixture corpus") {
    val texts = Tables.documents(spark, TestSpark.Sf0001)
      .select("text").as[String].collect().toSeq
    check(texts, 3)
    check(texts.take(50), 1)
    check(texts.take(50), 5)
  }

  test("native shingle hashes equal the SQL formulation on adversarial " +
      "shapes: double/leading/trailing spaces, all-space, unicode, repeats") {
    val texts = Seq(
      "a b c d e",
      "a  b c",            // empty token inside a shingle
      " a b c",            // leading space (empty first token)
      "a b c ",            // trailing space (empty last token)
      "   ",               // only empty tokens
      "a a a a a",         // one distinct shingle after dedup
      "über ñandú 漢字 emoji🙂 mixé",  // multibyte UTF-8 around the 0x20 scan
      "x y",               // under n tokens at n=3 (filtered)
      "p q r",             // exactly n tokens: one shingle
      "")                  // empty text: one empty token at n=1
    check(texts, 3)
    check(texts, 2)
    check(texts, 1)
  }

  test("null text yields null; under-n-token text yields an empty array " +
      "(pre-filter), matching split-path row filtering") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "a b")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextHash.hashedShingles(col("text"), 3).as("shs")).collect()
    assert(out.find(_.getLong(0) == 1L).get.isNullAt(1))
    assert(out.find(_.getLong(0) == 2L).get.getSeq[Long](1).isEmpty)
  }

  test("property: equality holds on randomized space-heavy strings") {
    val rnd = new scala.util.Random(7L)
    val alphabet = Seq("a", "bb", "ccc", "", " ", "  ", "δ", "z九")
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" ")
    }
    check(texts, 3)
    check(texts, 2)
  }
}
