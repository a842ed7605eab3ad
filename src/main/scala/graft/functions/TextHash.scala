package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-shingle hashing over the raw UTF-8 bytes.
  *
  * The dedup/containment/PageRank family's cost floor is building the
  * shingle sets: `split` materializes a token array, `transform` +
  * `concat_ws` rebuilds every shingle as a NEW string, `array_distinct`
  * and `sort_array` copy again — five array/string materializations per
  * document before a single byte is hashed. But under a single-space
  * split, every word n-gram shingle IS an exact substring of the
  * original text (split keeps empty tokens, `concat_ws(' ', ...)` of
  * consecutive tokens reproduces the bytes between their boundaries
  * verbatim, interior double-spaces included), so the shingle hashes
  * can be computed with ZERO string construction: scan the bytes once
  * for 0x20 token boundaries, then xxhash64 each shingle's byte slice
  * in place. A UTF-8 multibyte sequence never contains 0x20 (all
  * continuation bytes ≥ 0x80), so the byte scan is Unicode-safe.
  *
  * Bit-compatibility: the slice hash uses the same XXH64 core and seed
  * (42) as the `xxhash64` SQL function, so the output equals
  * `sort_array(transform(array_distinct(<shingle strings>), xxhash64))`
  * element-for-element — modulo dedup-by-hash versus dedup-by-string,
  * which differ only on a 64-bit collision (~1e-7 among 10^6 distinct
  * shingles, the family's long-accepted error class). TextHashSpec
  * proves equality against the SQL formulation on adversarial strings
  * (double/leading/trailing spaces, all-space, unicode, empty).
  */
object TextHashUtil {

  private val Seed = 42L // xxhash64's default seed — keep in lockstep

  /** Sorted distinct xxhash64 values of `text`'s word n-gram shingles;
    * empty when the text has fewer than n tokens. Called from generated
    * code (static forwarder), so it must stay allocation-light: one int
    * array of token starts, one long array of hashes, no strings.
    */
  def hashedShingles(text: UTF8String, n: Int): ArrayData = {
    val numBytes = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var spaces = 0
    var i = 0
    while (i < numBytes) {
      if (Platform.getByte(base, off + i) == ' ') spaces += 1
      i += 1
    }
    val tokens = spaces + 1
    val m = tokens - n + 1 // shingle count before dedup
    // note: empty text is NOT special-cased — at n=1 it has one empty
    // token whose shingle is the empty string, exactly as the split
    // path produces (the caller's size-filter decides whether to keep it)
    if (m <= 0)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // starts(t) = byte offset where token t begins; token t ends at
    // starts(t+1) - 1 (its trailing space), the last token at numBytes
    val starts = new Array[Int](tokens)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < numBytes) {
      if (Platform.getByte(base, off + i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val b = starts(s)
      val e = if (s + n == tokens) numBytes else starts(s + n) - 1
      out(s) = XXH64.hashUnsafeBytes(base, off + b, e - b, Seed)
      s += 1
    }
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < m) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) out else java.util.Arrays.copyOf(out, w))
  }
}

/** Catalyst expression wrapping [[TextHashUtil.hashedShingles]]: the
  * per-row work is one static call inside whole-stage codegen — no
  * interpreted lambdas, no intermediate token/shingle arrays.
  */
case class HashedWordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles needs n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.hashedShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.hashedShingles($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): HashedWordShingles = copy(child = newChild)
}

object TextHash {
  /** Column-level handle for [[HashedWordShingles]]. */
  def hashedShingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(HashedWordShingles(
      GraftColumnBridge.expression(text), n))
}
