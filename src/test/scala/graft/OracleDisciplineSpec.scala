package graft

import org.scalatest.funsuite.AnyFunSuite

/** Portability rules for the DuckDB oracle SQL (the r11 gate lesson).
  *
  * The driver's correctness gate runs each `SparkEntry.oracleSql` on
  * ITS DuckDB build, which is not pinned to the sandbox's 1.0.0. Round
  * 11 went 14 queries red on exactly one construct family: output bits
  * that pass through `round(<double>, 9)` (or a HUGEINT product chain)
  * — arithmetic whose last-digit behavior is engine-VERSION-sensitive
  * even when every upstream value is bit-identical. The reformulation
  * rules proven green on this board:
  *
  *   (a) integer scaling end-to-end with floor division
  *       (q_seasonality_dow idx_ppb, q_attribution_linear credit_ppm,
  *       q_percentile_cont);
  *   (b) transcendental/int128-tainted outputs coarsened through
  *       round(…, 6) as plain DOUBLE (q_source_kl, the r12 stat
  *       family) — at 6 digits the multiply-vs-string rounding
  *       boundary is ~10³ narrower per value than at 9;
  *   (c) raw doubles only from fixed IEEE chains over int64-range
  *       integers or value copies (q_interpolate, q_anomaly_robust,
  *       means, obs shares) — conversions and +,−,×,÷,√ are exactly
  *       specified, so no rounding step exists to disagree on;
  *   (d) exact integers ride DECIMAL(19/38,0) casts, never HUGEINT —
  *       HUGEINT is DuckDB-internal and its conversion chain is what
  *       broke q_changepoint with zero floating point in the query.
  *
  * This spec makes the rules structural: it would have caught all 14
  * r11 reds (each contained `round(…, 9)` or a bare HUGEINT cast) and
  * fails any future oracle that regrows the family.
  *
  * Sanctioned NON-offender (why the rules scan oracles, not Spark
  * code): quantize-INTO-DECIMAL-for-order-independent-sums — e.g.
  * pageRank's `bround(r/deg, 15) → DECIMAL(28,15)` per contribution,
  * the KL/bigram-NLL per-term DECIMAL(18,9) casts. There the oracle
  * uses a plain CAST (no `round()` call) and r11's gate itself is the
  * evidence the driver's double→DECIMAL cast agrees across builds
  * (every cast-based query stayed green while every round()-based
  * output went red). Spark-side `bround` is Spark's own BigDecimal
  * rounding — engine-stable by construction.
  */
class OracleDisciplineSpec extends AnyFunSuite {

  /** Every `round(`/`bround(` call's final literal-integer argument,
    * via a paren-matching scan (regexes can't see nesting). */
  private def roundPrecisions(sql: String): Seq[(Int, String)] = {
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[(Int, String)]
    var i = lower.indexOf("round(")
    while (i >= 0) {
      // scan the balanced argument list
      var depth = 1
      var j = i + "round(".length
      var lastTopComma = -1
      while (j < lower.length && depth > 0) {
        lower(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 1 => lastTopComma = j
          case _ =>
        }
        j += 1
      }
      if (lastTopComma >= 0 && depth == 0) {
        val arg = sql.substring(lastTopComma + 1, j - 1).trim
        if (arg.nonEmpty && arg.forall(_.isDigit))
          out += ((arg.toInt, sql.substring(i, math.min(j, i + 80))))
      }
      i = lower.indexOf("round(", i + 1)
    }
    out.result()
  }

  test("no oracle rounds a double at precision >= 7 — round(x, 9)-class " +
      "output bits are not portable across DuckDB builds (r11: 14 red)") {
    val offenders = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      roundPrecisions(sql).collect {
        case (p, frag) if p >= 7 => s"$name: round at $p digits [$frag]"
      }
    }
    assert(offenders.isEmpty,
      "engine-sensitive rounding in oracle SQL:\n" + offenders.mkString("\n"))
  }

  test("no oracle uses HUGEINT — int128 conversion chains diverge " +
      "across DuckDB builds (r11: q_changepoint red with zero floats); " +
      "exact wide integers ride DECIMAL(19/38,0) casts instead") {
    val offenders = SparkEntry.oracleSql.toSeq.collect {
      case (name, sql) if sql.toUpperCase.contains("HUGEINT") => name
    }
    assert(offenders.isEmpty,
      "HUGEINT in oracle SQL: " + offenders.mkString(", "))
  }

  test("regression canary: the r11 red constructs ARE what these rules " +
      "catch (spec self-check on synthetic offenders)") {
    // the q_anomaly_zscore r11 shape
    assert(roundPrecisions(
      "SELECT CAST(round((v - mean) / sd, 9) AS DECIMAL(18,9)) AS z")
      .exists(_._1 == 9))
    // nested parens must not confuse the precision scan
    assert(roundPrecisions(
      "SELECT round(sqrt(a / (b + c)), 6) AS x").map(_._1) == Seq(6))
    // round with no precision argument (round(x)) is ignored
    assert(roundPrecisions("SELECT round(v) FROM t").isEmpty)
  }
}
