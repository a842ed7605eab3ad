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
  *   (d) exact wide-integer ARITHMETIC rides DECIMAL casts, never
  *       HUGEINT — HUGEINT is DuckDB-internal and its conversion
  *       chain is what first broke q_changepoint with zero floating
  *       point in the query. But r12 sharpened the rule: a decimal
  *       wider than 18 is only portable as an INTERMEDIATE (exact
  *       comparisons, sums, argmax ordering are representation-
  *       independent); an EMITTED decimal128 column diverges across
  *       DuckDB builds at the value/hash-serialization layer —
  *       q_changepoint stayed red for three rounds (r10–r12) with
  *       all-integer math precisely because its output `score` was
  *       DECIMAL(38,0). Wide exact integers leave a query as their
  *       digit STRING (integer→digits is fully specified everywhere)
  *       or split/reduced into int64-backed columns.
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

  // ---- rule (d) as structure: no EMITTED decimal wider than 18 ----

  /** SQL with the CONTENT of single-quoted literals blanked to spaces
    * (quotes and length preserved): a paren or comma inside a string
    * literal must not shift the structural depth scan. `''` escapes
    * stay inside the literal.
    */
  private def stripLiterals(sql: String): String = {
    val sb = new StringBuilder(sql.length)
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql(i)
      if (!inStr) {
        if (c == '\'') inStr = true
        sb += c
      } else if (c == '\'') {
        if (i + 1 < sql.length && sql(i + 1) == '\'') {
          sb += ' '; sb += ' '; i += 1
        } else { inStr = false; sb += c }
      } else sb += (if (c == '\n') '\n' else ' ')
      i += 1
    }
    sb.toString
  }

  private def kwAt(lower: String, i: Int, w: String): Boolean =
    lower.startsWith(w, i) &&
      (i == 0 || !lower(i - 1).isLetterOrDigit) &&
      (i + w.length >= lower.length || !lower(i + w.length).isLetterOrDigit)

  /** Positions of `SELECT` keywords at paren depth 0. */
  private def topLevelSelects(sql: String): Seq[Int] = {
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[Int]
    var depth = 0
    var i = 0
    while (i < lower.length) {
      lower(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 's' if depth == 0 && lower.startsWith("select", i) &&
            (i == 0 || !lower(i - 1).isLetterOrDigit) &&
            (i + 6 >= lower.length || !lower(i + 6).isLetterOrDigit) =>
          out += i
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** The output items of EVERY top-level SELECT (the final query and
    * each of its UNION branches — every depth-0 SELECT is an output
    * branch, since CTE bodies sit inside parens): each branch's select
    * list split on depth-0 commas, with trailing `AS name` aliases
    * stripped (the emitted expression is what the rule inspects). */
  private def finalSelectItems(sql: String): Seq[String] = {
    val lower = sql.toLowerCase
    topLevelSelects(sql).flatMap { start =>
      val from = start + "select".length
      // end of this branch's select list: the first depth-0 FROM after
      // it (or EOF for FROM-less selects)
      var depth = 0
      var i = from
      var end = sql.length
      var found = false
      while (i < lower.length && !found) {
        lower(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case 'f' if depth == 0 && lower.startsWith("from", i) &&
              !lower(i - 1).isLetterOrDigit &&
              (i + 4 >= lower.length || !lower(i + 4).isLetterOrDigit) =>
            end = i; found = true
          case 's' if depth == 0 && i > from &&
              lower.startsWith("select", i) &&
              !lower(i - 1).isLetterOrDigit &&
              (i + 6 >= lower.length || !lower(i + 6).isLetterOrDigit) =>
            // FROM-less branch (e.g. `SELECT 1 UNION ALL SELECT 2`)
            end = i; found = true
          case _ =>
        }
        i += 1
      }
      val list = sql.substring(from, end)
      // split on depth-0 commas
      val items = Seq.newBuilder[String]
      depth = 0
      var s0 = 0
      var j = 0
      while (j < list.length) {
        list(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 =>
            items += list.substring(s0, j); s0 = j + 1
          case _ =>
        }
        j += 1
      }
      items += list.substring(s0)
      items.result().map(_.trim)
        // a FROM-less branch's last item may drag UNION keywords along;
        // cut at the first UNION/INTERSECT/EXCEPT keyword
        .map(it => "(?is)\\b(union|intersect|except)\\b.*$".r
          .replaceAllIn(it, ""))
        .map(_.trim)
        .map(it => "(?is)\\s+as\\s+[a-z_][a-z0-9_]*\\s*$".r
          .replaceAllIn(it, ""))
        .filter(_.nonEmpty)
    }
  }

  private val WideDecimal = raw"(?is)decimal\s*\(\s*(\d+)".r

  /** The select-list items of EVERY `SELECT` in the query (any depth:
    * CTE bodies, subqueries, top level) — each list scanned from its
    * keyword to the first same-depth FROM/UNION/INTERSECT/EXCEPT/
    * SELECT or the enclosing close paren, split on same-depth commas.
    */
  private def allSelectItems(sql: String): Seq[String] = {
    val lower = sql.toLowerCase
    val starts = (0 until sql.length).filter(kwAt(lower, _, "select"))
    starts.flatMap { start =>
      val from = start + "select".length
      var depth = 0
      var i = from
      var end = -1
      while (i < lower.length && end < 0) {
        lower(i) match {
          case '(' => depth += 1
          case ')' => if (depth == 0) end = i else depth -= 1
          case _ if depth == 0 &&
              (kwAt(lower, i, "from") || kwAt(lower, i, "union") ||
                kwAt(lower, i, "intersect") || kwAt(lower, i, "except") ||
                kwAt(lower, i, "order") || kwAt(lower, i, "select")) =>
            end = i
          case _ =>
        }
        i += 1
      }
      if (end < 0) end = sql.length
      val list = sql.substring(from, end)
      val items = Seq.newBuilder[String]
      depth = 0
      var s0 = 0
      var j = 0
      while (j < list.length) {
        list(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 =>
            items += list.substring(s0, j); s0 = j + 1
          case _ =>
        }
        j += 1
      }
      items += list.substring(s0)
      items.result().map(_.trim).filter(_.nonEmpty)
    }
  }

  /** Aliases of ANY select item (any depth) whose expression contains
    * a decimal cast wider than 18 — covers the trailing-cast shape
    * (`CAST(x AS DECIMAL(38,0)) AS score`) AND arithmetic over wide
    * casts (`CAST(a AS DECIMAL(38,0)) - CAST(b AS ...) AS score`) —
    * propagated TRANSITIVELY through plain re-aliases: an intermediate
    * CTE item that is exactly a tracked alias re-aliased
    * (`score AS s2`, `sc.score AS s2`) inherits wideness, so a
    * laundering hop cannot take the column out of scope (ADVICE r13).
    * Deliberately NAME-GLOBAL across CTE scopes (no scope resolution):
    * a narrow column that merely shares a tracked alias's name in an
    * unrelated CTE inherits wideness spuriously — the lint errs
    * strict, and the escape is renaming the clashing column, never
    * weakening the scan. */
  private def wideCastAliases(sql: String): Seq[String] = {
    val items = allSelectItems(sql)
    var tracked = items.flatMap { it =>
      if (WideDecimal.findAllMatchIn(it).exists(_.group(1).toInt > 18))
        raw"(?is)\s+as\s+([a-z_][a-z0-9_]*)\s*$$".r.findFirstMatchIn(it)
          .map(_.group(1).toLowerCase)
      else None
    }.toSet
    val reAlias =
      raw"(?is)^\s*(?:[a-z_][a-z0-9_]*\.)?([a-z_][a-z0-9_]*)\s+as\s+([a-z_][a-z0-9_]*)\s*$$".r
    var grew = true
    while (grew) {
      grew = false
      items.foreach { it =>
        reAlias.findFirstMatchIn(it).foreach { m =>
          val (src, dst) = (m.group(1).toLowerCase, m.group(2).toLowerCase)
          if (tracked(src) && !tracked(dst)) { tracked += dst; grew = true }
        }
      }
    }
    tracked.toSeq
  }

  test("no oracle EMITS a decimal wider than 18 — decimal128 output " +
      "columns are not portable across DuckDB builds at the value/" +
      "hash-serialization layer (r10–r12: q_changepoint red three " +
      "rounds on exact-integer math); wide intermediates are fine, " +
      "wide OUTPUT leaves as a digit string or int64-backed columns") {
    val offenders = SparkEntry.oracleSql.toSeq.flatMap { case (name, raw0) =>
      // literal contents blanked first: a paren or comma inside a
      // quoted string must not derail the structural scans
      val sql = stripLiterals(raw0)
      val items = finalSelectItems(sql)
      val direct = items.collect {
        case it if WideDecimal.findAllMatchIn(it)
            .exists(_.group(1).toInt > 18) =>
          s"$name: wide decimal cast emitted [${it.take(70)}]"
      }
      // a wide-cast alias flowing through bare (possibly via SELECT *
      // in intermediate CTEs) as an output item
      val aliases = wideCastAliases(sql)
      val bare = items.collect {
        case it if aliases.exists(a =>
            it.toLowerCase.matches(raw"(?s)([a-z_][a-z0-9_]*\.)?$a")) =>
          s"$name: wide-cast alias emitted bare [${it.take(70)}]"
      }
      // a top-level `SELECT *` cannot be typed statically: if any wide
      // cast is aliased anywhere in the query, star emission may carry
      // it to the output — conservatively an offender
      val star = items.collect {
        case it if aliases.nonEmpty &&
            it.matches(raw"(?s)([A-Za-z_][A-Za-z0-9_]*\.)?\*") =>
          s"$name: SELECT * emission with wide-cast aliases in scope " +
            s"[${aliases.mkString(",")}]"
      }
      direct ++ bare ++ star
    }
    assert(offenders.isEmpty,
      "decimal(>18) emitted by oracle SQL:\n" + offenders.mkString("\n"))
  }

  test("pinned-constant oracles key every scale branch on a CONTENT " +
      "fingerprint, not the row count alone — counts collide across " +
      "fixtures (sf0.001 and sf0.01 both have 500 docs/embeddings), " +
      "so a count-only key could silently bless a regenerated fixture " +
      "with stale constants; the fingerprint must be content-derived " +
      "(BIT_XOR / SUM(LENGTH)). Was convention; structural since r14") {
    def offendersIn(oracles: Seq[(String, String)]): Seq[String] = {
      val whenCond = raw"(?is)\bwhen\b(.*?)\bthen\b".r
      val nKey = raw"(?i)\bn\s*(?:=\s*(\d+)|in\s*\(\s*(\d+))".r
      val fpKey = raw"(?i)\b(fp|tl)\s*(=|in\b)".r
      val fpDef = raw"(?is)\s+as\s+(fp|tl)\s*$$".r
      val contentAgg = raw"(?i)(bit_xor|sum\s*\(\s*length)".r
      oracles.flatMap { case (name, raw0) =>
        val sql = stripLiterals(raw0)
        // the check is scoped to the select items that DEFINE fp/tl
        // (review r15: a whole-SQL contentAgg search would bless
        // `MAX(id) AS fp` as long as an unrelated BIT_XOR appeared
        // anywhere in the same statement); the whole-SQL search stays
        // only as the fallback for a query with no `AS fp/tl` item
        val fpDefs = allSelectItems(sql)
          .filter(it => fpDef.findFirstIn(it).isDefined)
        val fpNotContent =
          if (fpDefs.nonEmpty)
            fpDefs.exists(it => contentAgg.findFirstIn(it).isEmpty)
          else contentAgg.findFirstIn(sql).isEmpty
        whenCond.findAllMatchIn(sql).map(_.group(1)).toSeq.flatMap { cond =>
          nKey.findFirstMatchIn(cond).flatMap { m =>
            val lit = Option(m.group(1)).getOrElse(m.group(2)).toLong
            // a comparison of n against a fixture-sized literal
            // (≥ 100) is a scale key; smaller literals are data logic
            // (e.g. q_quantile_norm's single-row group case)
            if (lit < 100) None
            else if (fpKey.findFirstIn(cond).isEmpty)
              Some(s"$name: count-only scale key [${cond.trim.take(60)}]")
            else if (fpNotContent)
              Some(s"$name: fingerprint is not content-derived " +
                s"[${cond.trim.take(60)}]")
            else None
          }
        }
      }
    }
    assert(offendersIn(SparkEntry.oracleSql.toSeq).isEmpty,
      "count-only pinned-constant keying:\n" +
        offendersIn(SparkEntry.oracleSql.toSeq).mkString("\n"))
    // self-check: a count-only key IS caught, the keyed shape passes,
    // and a non-content 'fingerprint' is caught
    val red = "WITH f AS (SELECT COUNT(*) AS n FROM t) " +
      "SELECT CASE WHEN n = 500 THEN 7 END AS x FROM f"
    assert(offendersIn(Seq("synthetic" -> red)).nonEmpty)
    val green = "WITH f AS (SELECT COUNT(*) AS n, BIT_XOR(h) AS fp " +
      "FROM t) SELECT CASE WHEN n = 500 AND fp = 3 THEN 7 END AS x FROM f"
    assert(offendersIn(Seq("synthetic" -> green)).isEmpty)
    val fake = "WITH f AS (SELECT COUNT(*) AS n, MAX(id) AS fp FROM t) " +
      "SELECT CASE WHEN n = 500 AND fp = 3 THEN 7 END AS x FROM f"
    assert(offendersIn(Seq("synthetic" -> fake)).nonEmpty)
    // a non-content fp does NOT get laundered by an unrelated content
    // aggregate elsewhere in the statement (review r15: the r14 cut
    // searched the whole SQL)
    val fakeHidden = "WITH f AS (SELECT COUNT(*) AS n, MAX(id) AS fp, " +
      "BIT_XOR(z) AS other FROM t) " +
      "SELECT CASE WHEN n = 500 AND fp = 3 THEN 7 END AS x FROM f"
    assert(offendersIn(Seq("synthetic" -> fakeHidden)).nonEmpty)
  }

  test("registry completeness: every key in SparkEntry.queries has an " +
      "oracleSql entry OR a named rows-only sanction with a reason — " +
      "no query ships oracle-free silently (VERDICT r14 #6; was " +
      "convention, structural since r15)") {
    // The ONLY sanctioned rows-only queries, each with the reason the
    // judge accepted. Adding a query without an oracle now requires
    // editing this map — a reviewed, named decision, not an omission.
    val rowsOnlySanctioned: Map[String, String] = Map(
      "q_embed_pca" -> ("row-level float eigenvector projections are " +
        "legitimately unpinnable (partition-order Gram jitter rotates " +
        "near-degenerate eigenvectors); the model's SPECTRUM is " +
        "hash-exact via q_embed_pca_spectrum and its invariants are " +
        "pinned in PcaSpec — sanctioned in VERDICT r13/r14"))
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val uncovered = queries -- oracles -- rowsOnlySanctioned.keySet
    assert(uncovered.isEmpty,
      "queries with neither an oracle nor a named rows-only sanction: " +
        uncovered.toSeq.sorted.mkString(", "))
    // sanctions must stay live in both directions: a sanctioned name
    // must exist in the registry (else the sanction is stale), and
    // must NOT also have an oracle (else the sanction is obsolete)
    val staleSanction = rowsOnlySanctioned.keySet -- queries
    assert(staleSanction.isEmpty,
      s"rows-only sanction for unregistered queries: $staleSanction")
    val obsoleteSanction = rowsOnlySanctioned.keySet & oracles
    assert(obsoleteSanction.isEmpty,
      s"rows-only sanction for queries that HAVE oracles: $obsoleteSanction")
    // and every oracle must point at a registered query — a renamed
    // query must rename its oracle in the same commit
    val orphanOracles = oracles -- queries
    assert(orphanOracles.isEmpty,
      s"oracles with no matching registered query: $orphanOracles")
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

  test("regression canary: the r12 red construct — a DECIMAL(38,0) cast " +
      "in a CTE whose alias flows bare to the output — is caught; the " +
      "green reformulations (digit string, double reduction) pass") {
    // the exact q_changepoint r10–r12 shape: wide cast in `sc`, alias
    // passed through `r` (SELECT *) into the final list bare
    val r12Red =
      """WITH sc AS (SELECT grp, day,
        |  CAST(abs(a * b - c * d) AS DECIMAL(38,0)) AS score, n FROM t),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY grp
        |    ORDER BY score DESC) AS rk FROM sc)
        |SELECT grp, day AS change_day, score, CAST(n AS BIGINT) AS n_days
        |FROM r WHERE rk = 1""".stripMargin
    assert(wideCastAliases(r12Red) == Seq("score"))
    assert(finalSelectItems(r12Red).exists(_.equalsIgnoreCase("score")))
    // direct emission in the final list is caught too
    val direct = "SELECT CAST(x AS DECIMAL(28,6)) AS y FROM t"
    assert(finalSelectItems(direct).exists(it =>
      WideDecimal.findAllMatchIn(it).exists(_.group(1).toInt > 18)))
    // ... including in an EARLIER top-level UNION branch (every
    // depth-0 SELECT is an output branch and all are scanned)
    val unionBranch = "SELECT CAST(x AS DECIMAL(28,6)) AS y FROM t " +
      "UNION ALL SELECT CAST(z AS BIGINT) FROM u ORDER BY 1"
    assert(finalSelectItems(unionBranch).exists(it =>
      WideDecimal.findAllMatchIn(it).exists(_.group(1).toInt > 18)))
    assert(finalSelectItems(unionBranch).size == 2)
    // green shapes: digit-string emission; wide intermediate REDUCED
    // to double in the final list (q_chi2); qualified bare alias
    val green =
      """WITH sc AS (SELECT CAST(round(e, 6) AS DECIMAL(28,6)) AS term,
        |  CAST(w AS DECIMAL(37,0)) AS score FROM t)
        |SELECT CAST(SUM(term) AS DOUBLE) AS chi2,
        |  CAST(score AS VARCHAR) AS score_str FROM sc GROUP BY score"""
        .stripMargin
    val items = finalSelectItems(green)
    assert(!items.exists(it =>
      WideDecimal.findAllMatchIn(it).exists(_.group(1).toInt > 18)))
    assert(!items.exists(it => wideCastAliases(green).exists(a =>
      it.toLowerCase.matches(raw"(?s)([a-z_][a-z0-9_]*\.)?$a"))))
    // qualified bare pass-through (r.score) is still an offender
    assert(finalSelectItems("WITH sc AS (SELECT CAST(x AS DECIMAL(38,0))" +
        " AS score FROM t) SELECT r.score FROM sc r")
      .exists(_.toLowerCase.matches(raw"(?s)([a-z_][a-z0-9_]*\.)?score")))
    // arithmetic OVER wide casts aliased in a CTE is captured too (the
    // trailing-cast-only regex of the first cut missed this shape)
    assert(wideCastAliases("WITH sc AS (SELECT CAST(a AS DECIMAL(38,0))" +
      " - CAST(b AS DECIMAL(38,0)) AS score FROM t) SELECT grp FROM sc")
      == Seq("score"))
    // parens inside string literals must not derail the depth scan
    val withLit = stripLiterals("WITH sc AS (SELECT CAST(x AS " +
      "DECIMAL(38,0)) AS score, '(label' AS tag FROM t) SELECT score FROM sc")
    assert(wideCastAliases(withLit) == Seq("score"))
    assert(finalSelectItems(withLit).exists(_.equalsIgnoreCase("score")))
    // SELECT * with a wide-cast alias in scope is conservatively wide
    val star = stripLiterals("WITH sc AS (SELECT CAST(x AS " +
      "DECIMAL(38,0)) AS score FROM t) SELECT * FROM sc")
    assert(wideCastAliases(star) == Seq("score"))
    assert(finalSelectItems(star)
      .exists(_.matches(raw"(?s)([A-Za-z_][A-Za-z0-9_]*\.)?\*")))
    // re-alias laundering through an intermediate CTE (`score AS s2`,
    // then emit s2) inherits wideness transitively — the ADVICE r13
    // false negative; qualified sources (sc.score AS s2) too
    val laundered = stripLiterals(
      "WITH sc AS (SELECT CAST(x AS DECIMAL(38,0)) AS score FROM t), " +
        "mid AS (SELECT sc.score AS s2 FROM sc) SELECT s2 FROM mid")
    assert(wideCastAliases(laundered).toSet == Set("score", "s2"))
    assert(finalSelectItems(laundered).exists(it =>
      wideCastAliases(laundered).exists(a =>
        it.toLowerCase.matches(raw"(?s)([a-z_][a-z0-9_]*\.)?$a"))))
  }
}
