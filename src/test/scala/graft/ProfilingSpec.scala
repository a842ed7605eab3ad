package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Layout, Profiling}
import graft.ops.Archive

/** Hand-computed semantics for the round-10 profiling/layout/diff
  * operators: equi-width histogram bucket math, per-domain stats,
  * exact-moment z-score flags, Morton interleave bit-exactness, and
  * snapshot-diff classification (including null handling).
  */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- histogram -------------------------------------------------------

  test("histogram: 5 buckets over 0..10 — uniform widths, max value " +
      "clamps into the last bucket, empty buckets absent") {
    val df = (0 to 10).map(_.toDouble).toDF("v")
    val h = Profiling.histogram(df, "v", nBuckets = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // width 2: buckets 0..4 get [0,2) [2,4) [4,6) [6,8) [8,10]: 2,2,2,2,3
    assert(h.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(h.map(_._4).toSeq == Seq(2L, 2L, 2L, 2L, 3L))
    assert(h.head._2 == 0.0 && h.head._3 == 2.0)
    assert(h.last._2 == 8.0 && h.last._3 == 10.0)
  }

  test("histogram: a constant column lands in one bucket 0 (no div-by-zero)") {
    val h = Profiling.histogram(Seq(7.0, 7.0, 7.0).toDF("v"), "v", 20)
      .collect()
    assert(h.length == 1 && h.head.getLong(0) == 0L && h.head.getLong(3) == 3L)
  }

  test("histogram: nulls are excluded from the counts") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val total = Profiling.histogram(df, "v", 2)
      .agg(sum("n")).head.getLong(0)
    assert(total == 2L)
  }

  // ---- domain stats ----------------------------------------------------

  test("domainStats: volumes, language diversity, and cross-source " +
      "exact-dup pressure, computed by hand") {
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "web", 16L),
      (2L, "alpha beta gamma", "en", "web", 16L),   // dup of 1 (same source)
      (3L, "delta epsilon", "de", "web", 13L),
      (4L, "alpha beta gamma", "en", "books", 16L), // dup of 1/2 (cross-source)
      (5L, "zeta", "en", "books", 4L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Profiling.domainStats(docs, "text", "lang", "source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(out == Seq(
      ("books", 2L, 1L, 20L, 4L, 1L, 10.0),  // words: 3 + 1; doc 4 is a dup
      ("web", 3L, 2L, 45L, 8L, 2L, 15.0)))   // words: 3 + 3 + 2; docs 1,2 dups
  }

  // ---- z-score outliers ------------------------------------------------

  test("zscoreOutliers: a planted extreme value is flagged with the " +
      "hand-computed z; in-band rows are absent") {
    // group g: 9 values at 10.0 and one at 110.0
    // mean = 20, var = (sum((x-20)^2))/9 = (9*100 + 8100)/9 = 1000, sd ~ 31.6
    // z(110) = 90/31.6 = 2.846 < 3 → widen: use 4 nines and one spike
    val vals = Seq.fill(19)(10.0) :+ 200.0
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("event_id", "event_type", "value")
    // mean = (19*10+200)/20 = 19.5; ss = 19*(9.5^2) + 180.5^2 = 1714.75+32580.25
    // var = 34295/19 = 1805; sd = 42.485..; z(200) = 180.5/42.485 = 4.248..
    val out = Profiling.zscoreOutliers(df, "event_type", "value",
      "event_id", zCut = 3.0).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 19L)
    val z = out.head.getDouble(3)
    assert(math.abs(z - 4.2485) < 1e-3, s"z=$z")
  }

  test("zscoreOutliers: groups are independent — a value ordinary in a " +
      "wide group is an outlier in a tight one") {
    val tight = (0L to 9L).map(i => (i, "tight", if (i == 9) 11.0 else 10.0))
    val wide = (10L to 19L).map(i => (i, "wide", i.toDouble * 50))
    val df = (tight ++ wide).toDF("event_id", "event_type", "value")
    val flagged = Profiling.zscoreOutliers(df, "event_type", "value",
        "event_id", zCut = 2.5)
      .select("grp").as[String].collect().toSet
    assert(flagged == Set("tight"))
  }

  // ---- z-order ---------------------------------------------------------

  test("zorderValue: bit-exact Morton interleave (x even, y odd)") {
    // x=5 (101), y=3 (011), bits=3:
    // pos0=x0=1, pos1=y0=1, pos2=x1=0, pos3=y1=1, pos4=x2=1, pos5=y2=0 → 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zorderValue(col("x"), col("y"), 3).as("z"))
      .head.getLong(0)
    assert(z == 27L)
    // identity checks: z(0,0)=0; z(1,0)=1; z(0,1)=2; z(2^k-1,2^k-1)=4^k-1
    val zs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (7L, 7L)).toDF("x", "y")
      .select(Layout.zorderValue(col("x"), col("y"), 3).as("z"))
      .as[Long].collect().toSeq
    assert(zs == Seq(0L, 1L, 2L, 63L))
  }

  test("zorderBucketStats: buckets partition the corpus and bound BOTH " +
      "dimensions (the pruning win over a single-column sort)") {
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val stats = Layout.zorderBucketStats(grid.toDF("x", "y"), "x", "y",
      bits = 5, nBuckets = 16).collect()
    assert(stats.map(_.getLong(1)).sum == 1024L)
    // 16 buckets over a full 32x32 grid: each Z-range bucket is one
    // 8x8-ish tile — every bucket's x-span AND y-span must be ≤ 8
    // (a lexicographic (x,y) sort would give y-spans of 31)
    stats.foreach { r =>
      val (xLo, xHi, yLo, yHi) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(xHi - xLo <= 8, s"x span too wide: $r")
      assert(yHi - yLo <= 8, s"y span too wide: $r")
    }
  }

  test("zorderValue rejects out-of-range bits") {
    intercept[IllegalArgumentException] {
      Layout.zorderValue(col("x"), col("y"), 0)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderValue(col("x"), col("y"), 32)
    }
  }

  // ---- snapshot diff ---------------------------------------------------

  test("snapshotDiff: added/removed/changed classified; unchanged rows " +
      "excluded; null-safe comparison both ways") {
    val a = Seq(
      (1L, Some("x"), 1.0),  // unchanged
      (2L, Some("y"), 2.0),  // changed (value)
      (3L, None: Option[String], 3.0), // changed (null → "z")
      (4L, Some("w"), 4.0),  // removed
      (6L, None: Option[String], 6.0)  // unchanged (null == null)
    ).toDF("k", "s", "v")
    val b = Seq(
      (1L, Some("x"), 1.0),
      (2L, Some("y"), 2.5),
      (3L, Some("z"), 3.0),
      (5L, Some("n"), 5.0),  // added
      (6L, None: Option[String], 6.0)
    ).toDF("k", "s", "v")
    val out = Archive.snapshotDiff(a, b, "k", Seq("s", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((2L, "changed"), (3L, "changed"),
      (4L, "removed"), (5L, "added")))
  }

  test("snapshotDiff of a snapshot against itself is empty") {
    val a = Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "s", "v")
    assert(Archive.snapshotDiff(a, a, "k", Seq("s", "v")).isEmpty)
  }

  // ---- CDC apply -------------------------------------------------------

  test("applyChanges: delete removes, update replaces the full row, " +
      "insert adds, delete of a missing key is a no-op") {
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "b", 2.0, "D"),   // delete
      (3L, "c2", 33.0, "U"), // full-row replace
      (4L, "d", 4.0, "I"),   // insert
      (9L, "z", 9.0, "D")    // delete of a key base never had
    ).toDF("k", "s", "v", "op")
    val out = Archive.applyChanges(base, changes, "k", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a", 1.0), (3L, "c2", 33.0), (4L, "d", 4.0)))
    // re-applying the same change set is a fixpoint (upserts replace
    // themselves, deletes stay gone)
    val again = Archive.applyChanges(
      Archive.applyChanges(base, changes, "k", "op"), changes, "k", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(again == out)
  }

  test("applyChanges validates its contract loudly") {
    val base = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException] {  // missing op column
      Archive.applyChanges(base, Seq((1L, "a")).toDF("k", "s"), "k", "op")
    }
    intercept[IllegalArgumentException] {  // changes missing a base column
      Archive.applyChanges(base, Seq((1L, "D")).toDF("k", "op"), "k", "op")
    }
  }

  test("applyChanges validate=true rejects duplicate change keys at " +
      "execution time; unique keys pass unchanged") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val dupChanges = Seq((2L, "x", "U"), (2L, "y", "U"))
      .toDF("k", "s", "op")
    val err = intercept[Exception] {
      Archive.applyChanges(base, dupChanges, "k", "op", validate = true)
        .collect()
    }
    assert(err.getMessage.contains("duplicate key in changes"))
    // without validate the contract violation passes silently (the
    // documented hazard the flag exists to catch)
    assert(Archive.applyChanges(base, dupChanges, "k", "op")
      .filter($"k" === 2L).count() == 2L)
    // unique-keyed changes produce identical output with and without
    // the guard
    val ok = Seq((2L, "x", "U"), (3L, "c", "I")).toDF("k", "s", "op")
    val strict = Archive.applyChanges(base, ok, "k", "op", validate = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(strict == Seq((1L, "a"), (2L, "x"), (3L, "c")))
  }

  // ---- column profile --------------------------------------------------

  test("columnProfile: hand-computed null/distinct/min-max per column; " +
      "nulls excluded from counts and extremes") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(2L), Some("x")),
      (Some(2L), None), (None, None))
      .toDF("a", "b")
    val prof = graft.ext.Profiling.columnProfile(df, Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.getString(4)), Option(r.getString(5)))).toSeq
    assert(prof == Seq(
      ("a", 4L, 3L, 2L, Some("1"), Some("2")),
      ("b", 4L, 2L, 1L, Some("x"), Some("x"))))
  }

  test("columnProfile validates its inputs loudly") {
    val df = Seq((1L, "x")).toDF("a", "b")
    intercept[IllegalArgumentException] {
      graft.ext.Profiling.columnProfile(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.ext.Profiling.columnProfile(df, Seq("a", "missing"))
    }
  }

  // ---- grouped percentiles ---------------------------------------------

  test("groupPercentiles: PERCENTILE_DISC ranks by hand — ⌈p·n/100⌉ " +
      "selection, singleton group returns its value everywhere, ties " +
      "are value-deterministic") {
    val df = (1 to 10).map(v => ("a", v.toDouble)) :+ ("b", 7.0)
    val out = graft.ext.Profiling.groupPercentiles(
        df.toDF("g", "v"), "g", "v", Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // a: n=10 → ranks 5, 9, 10 → values 5, 9, 10; b: singleton → 7
    assert(out == Seq(("a", 10L, 5.0, 9.0, 10.0), ("b", 1L, 7.0, 7.0, 7.0)))
    // all-tied group: any rank selects the same value
    val tied = graft.ext.Profiling.groupPercentiles(
        Seq(("t", 3.0), ("t", 3.0), ("t", 3.0)).toDF("g", "v"),
        "g", "v", Seq(50, 99))
      .collect()(0)
    assert((tied.getDouble(2), tied.getDouble(3)) == ((3.0, 3.0)))
    intercept[IllegalArgumentException] {
      graft.ext.Profiling.groupPercentiles(df.toDF("g", "v"), "g", "v",
        Seq(0))
    }
  }

  test("eqdepthHistogram: ANSI NTILE by hand — 10 rows into 4 buckets " +
      "split 3/3/2/2, bounds are value copies, tie column decides a " +
      "boundary tie deterministically") {
    // values 1..10 with ids 1..10: buckets [1,2,3][4,5,6][7,8][9,10]
    val df = (1 to 10).map(v => ("a", v.toDouble, v.toLong)).toDF("g", "v", "id")
    val out = graft.ext.Profiling.eqdepthHistogram(df, "g", "v", "id", 4)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(out == Seq((1, 3L, 1.0, 3.0), (2, 3L, 4.0, 6.0),
      (3, 2L, 7.0, 8.0), (4, 2L, 9.0, 10.0)))
    // a tie spanning the bucket boundary: four 5.0s with ids 1..4 into
    // 2 buckets — ids 1,2 land in bucket 1, ids 3,4 in bucket 2, and
    // both buckets report lo = hi = 5.0 (copies, not interpolations)
    val tied = Seq(("t", 5.0, 1L), ("t", 5.0, 2L), ("t", 5.0, 3L),
      ("t", 5.0, 4L)).toDF("g", "v", "id")
    val t = graft.ext.Profiling.eqdepthHistogram(tied, "g", "v", "id", 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(t == Seq((1, 2L, 5.0, 5.0), (2, 2L, 5.0, 5.0)))
    intercept[IllegalArgumentException] {
      graft.ext.Profiling.eqdepthHistogram(df, "g", "v", "id", 0)
    }
  }

  test("benfordDigits: integer-exact leading digits by hand — 1.23 → " +
      "123 cents → digit 1; zero/negative rows drop; shares sum to 1; " +
      "expected shares are the Benford constants") {
    // cents: 123→1, 950→9, 12→1, 5→5, 0 dropped, -3.0 dropped
    val df = Seq(1.23, 9.50, 0.12, 0.05, 0.0, -3.0).toDF("v")
    val out = graft.ext.Profiling.benfordDigits(df, "v")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(out.map(t => (t._1, t._2)) == Seq((1, 2L), (5, 1L), (9, 1L)))
    assert(out.map(_._3) == Seq(0.5, 0.25, 0.25))
    // Benford constants at the bround(…, 6) output precision
    assert(math.abs(out(0)._4 - 0.301029996) < 1e-6)
    assert(math.abs(out(1)._4 - math.log10(1.2)) < 1e-6)
    assert(math.abs(out(2)._4 - math.log10(10.0 / 9.0)) < 1e-6)
  }

  // ---- correlation / chi-square ---------------------------------------

  test("groupCorrelation: perfectly linear data gives r = ±1 exactly; " +
      "zero-variance groups drop out") {
    val df = Seq(
      (1L, "up", 0, 0.0), (2L, "up", 1, 1.0), (3L, "up", 2, 2.0),
      (4L, "dn", 0, 2.0), (5L, "dn", 1, 1.0), (6L, "dn", 2, 0.0),
      (7L, "fl", 0, 3.0), (8L, "fl", 1, 3.0))
      .toDF("id", "g", "x", "v")
    val out = graft.ext.Profiling.groupCorrelation(df, "g", col("x"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(out == Map("up" -> 1.0, "dn" -> -1.0)) // "fl" dropped: dy = 0
  }

  test("chiSquare: independent 2x2 gives 0; perfectly dependent 2x2 " +
      "gives chi2 = N (zero-count cells INCLUDED — dropping them would " +
      "halve it); dof = (r-1)(c-1)") {
    // independent: every (r, c) cell = 5
    val ind = (for { r <- Seq("A", "B"); c <- 0 to 1; _ <- 1 to 5 }
      yield (r, c)).toDF("r", "c")
    val i = graft.ext.Profiling.chiSquare(ind, col("r"), col("c"))
      .collect()(0)
    assert(i.getDouble(0) == 0.0 && i.getLong(1) == 1L && i.getLong(2) == 20L)
    // dependent: A only with 0, B only with 1 — chi2 must equal N = 20
    val dep = ((1 to 10).map(_ => ("A", 0)) ++ (1 to 10).map(_ => ("B", 1)))
      .toDF("r", "c")
    val p = graft.ext.Profiling.chiSquare(dep, col("r"), col("c"))
      .collect()(0)
    assert(p.getDouble(0) == 20.0, s"chi2=${p.getDouble(0)}")
    assert(p.getLong(1) == 1L && p.getLong(2) == 20L)
  }

  // ---- robust outliers -------------------------------------------------

  test("robustOutliers: hand-computed median/MAD — the extreme value " +
      "cannot mask itself (the moment z-score's weakness); zero-MAD " +
      "groups drop out") {
    // 1..9 plus 100: median = 5 (rank (10·50+99)/100 = 5 of the asc
    // order), deviations sorted 0,1,1,2,2,3,3,4,4,95 → MAD = 2;
    // only v=100 has ad (95) ≥ 3.5·MAD (7); score = 95/2 = 47.5
    val df = ((1 to 9).map(v => (v.toLong, "a", v.toDouble)) :+
      (10L, "a", 100.0)).toDF("id", "g", "v")
    val out = graft.ext.Profiling.robustOutliers(df, "g", "v", "id", 3.5)
      .collect().map(r => (r.getLong(0), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(out == Seq((10L, 100.0, 47.5)))
    // the same value under the MOMENT z-score at cut 3.0: stddev ≈ 29.8
    // is inflated by the outlier itself → z ≈ 2.85 < 3 and it escapes —
    // the documented masking the robust gate exists to fix
    val masked = graft.ext.Profiling.zscoreOutliers(df, "g", "v", "id", 3.0)
      .count()
    assert(masked == 0L)
    // constant group: MAD = 0 → no robust scale → no rows
    val const = Seq((1L, "c", 5.0), (2L, "c", 5.0), (3L, "c", 5.0))
      .toDF("id", "g", "v")
    assert(graft.ext.Profiling.robustOutliers(const, "g", "v", "id", 3.5)
      .isEmpty)
    intercept[IllegalArgumentException] {
      graft.ext.Profiling.robustOutliers(df, "g", "v", "id", 0.0)
    }
  }

  // ---- winsorization ---------------------------------------------------

  test("winsorize: hand-computed [p05, p95] clip on 1..20 — extremes cap " +
      "to the band, interior values pass through unchanged") {
    val df = (1 to 20).map(v => (v.toLong, "a", v.toDouble))
      .toDF("id", "g", "v")
    // n=20: p05 rank = (20*5+99)/100 = 1 → lo=1.0 (nothing clips low);
    // p95 rank = (20*95+99)/100 = 19 → hi=19.0 (only v=20 clips)
    val out = graft.ext.Profiling.winsorize(df, "g", "v", "id", 5, 95)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out(20L) == 19.0)
    assert((1 to 19).forall(v => out(v.toLong) == v.toDouble))
    intercept[IllegalArgumentException] {
      graft.ext.Profiling.winsorize(df, "g", "v", "id", 95, 5)
    }
  }

  // ---- quantile normalization -----------------------------------------

  test("quantileNorm: RANK tie semantics by hand; singleton group pins " +
      "to 0.0") {
    val df = Seq(
      (1L, "g", 10.0), (2L, "g", 20.0), (3L, "g", 20.0), (4L, "g", 40.0),
      (5L, "solo", 7.0)
    ).toDF("event_id", "event_type", "value")
    val out = Profiling.quantileNorm(df, "event_type", "value", "event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    // ranks in g: 10→1, 20→2 (tie), 20→2, 40→4; n=4 → pr = (r-1)/3
    assert(out == Map(1L -> 0.0, 2L -> (1.0 / 3), 3L -> (1.0 / 3),
      4L -> 1.0, 5L -> 0.0))
  }

  // ---- groupPercentilesCont ---------------------------------------------

  test("groupPercentilesCont: hand-computed interpolation on n=5 — " +
      "p50 hits a row exactly, p90 blends 80/100 at 0.6, p99 at 0.96") {
    val df = Seq(("g", 10.00), ("g", 20.00), ("g", 40.00), ("g", 80.00),
      ("g", 100.00)).toDF("grp", "v")
    val out = Profiling.groupPercentilesCont(df, "grp", "v", Seq(50, 90, 99))
      .collect().head
    // h = (n−1)p/100: p50 → 2.0 (exact row 40); p90 → 3.6 → 80·0.4 +
    // 100·0.6 = 92; p99 → 3.96 → 80·0.04 + 100·0.96 = 99.2
    assert(out.getLong(1) == 5L)
    assert(out.getDouble(2) == 40.0 && out.getDouble(3) == 92.0 &&
      out.getDouble(4) == 99.2, out.toString)
  }

  test("groupPercentilesCont: n=1 group returns the single value at " +
      "every percentile (h=0, hi pick absent, coalesce covers it)") {
    val df = Seq(("a", 7.25)).toDF("grp", "v")
    val out = Profiling.groupPercentilesCont(df, "grp", "v", Seq(50, 99))
      .collect().head
    assert(out.getDouble(2) == 7.25 && out.getDouble(3) == 7.25)
  }

  test("expectations: one scan, per-rule violation counts — nulls " +
      "violate only the not-null rule (range rules skip NULL inputs by " +
      "SQL semantics, documented)") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -5.0), (null, 7.0), (4L, null))
      .toDF("k", "v")
    val out = Profiling.expectations(df, Seq(
        "k_not_null" -> col("k").isNull,
        "v_positive" -> !(col("v") > 0.0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map("k_not_null" -> (4L, 1L), "v_positive" -> (4L, 1L)),
      out.toString)
  }

  // ---- ksTest / mannWhitney ----------------------------------------------

  test("ksTest: hand-computed supremum — A={1,2,3} vs B={2,4} peaks at " +
      "x=3 with D = 1/2; scaled statistic matches sqrt(6/5)/2") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 2.0), ("B", 4.0))
      .toDF("g", "v")
    val r = Profiling.ksTest(df, "g", "v", "A", "B").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    // deviations ×(n1·n2): x=1→2, x=2→1, x=3→3, x=4→0 ⇒ D = 3/6
    assert(r.getDouble(2) == 0.5, r.toString)
    assert(math.abs(r.getDouble(3) -
      math.sqrt(6.0 / 5.0) * 0.5) < 1e-6, r.toString)
  }

  test("ksTest: identical samples give D = 0 exactly") {
    val df = Seq(("A", 5.0), ("A", 7.0), ("B", 5.0), ("B", 7.0)).toDF("g", "v")
    val r = Profiling.ksTest(df, "g", "v", "A", "B").collect().head
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("mannWhitney: hand-computed midranks — A={1,2} vs B={2,3} gives " +
      "the half-integer U = 0.5 and z = -sqrt(1.5); all-tied input " +
      "degenerates to NULL z") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0)).toDF("g", "v")
    val r = Profiling.mannWhitney(df, "g", "v", "A", "B").collect().head
    // ranks: 1→1, the tied 2s→2.5 each, 3→4; R₁ = 3.5, U₁ = 3.5−3 = 0.5
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.5, r.toString)
    // σ² = n₁n₂(N³−N−Σ(t³−t))/(12N(N−1)) = 4·54/144 = 1.5;
    // z = (0.5−2)/√1.5 = −√1.5
    assert(math.abs(r.getDouble(3) + math.sqrt(1.5)) < 1e-6,
      r.toString)
    val tied = Seq(("A", 3.0), ("A", 3.0), ("B", 3.0)).toDF("g", "v")
    val t = Profiling.mannWhitney(tied, "g", "v", "A", "B").collect().head
    assert(t.isNullAt(3), t.toString)
  }

  test("welchT: hand-computed — A={1,3} vs B={2,4,6} gives t = " +
      "-2/sqrt(7/3), df = 49/17; single-observation side yields NULL t") {
    val df = Seq(("A", 1.0), ("A", 3.0), ("B", 2.0), ("B", 4.0), ("B", 6.0))
      .toDF("g", "v")
    val r = Profiling.welchT(df, "g", "v", "A", "B").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 4.0)
    // s_a² = 2, s_b² = 4 ⇒ q_a = 1, q_b = 4/3; t = −2/√(7/3)
    assert(math.abs(r.getDouble(4) -
      (-2.0 / math.sqrt(7.0 / 3.0))) < 1e-6, r.toString)
    assert(math.abs(r.getDouble(5) - 49.0 / 17.0) < 1e-6,
      r.toString)
    val tiny = Seq(("A", 5.0), ("B", 1.0), ("B", 2.0)).toDF("g", "v")
    val t = Profiling.welchT(tiny, "g", "v", "A", "B").collect().head
    assert(t.isNullAt(4) && t.isNullAt(5), t.toString)
  }

  // ---- groupRegression -------------------------------------------------

  test("groupRegression: exact line y = 2x + 1 recovers slope 2, " +
      "intercept 1, r² = 1; constant-y group gets slope 0 with NULL r²") {
    val df = Seq(
      ("a", 0L, 1.00), ("a", 1L, 3.00), ("a", 2L, 5.00), ("a", 3L, 7.00),
      ("b", 0L, 4.25), ("b", 5L, 4.25), ("b", 9L, 4.25)
    ).toDF("grp", "x", "value")
    val out = Profiling.groupRegression(df, "grp", col("x"), "value")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4)))
      .toMap
    val (na, sa, ia, ra) = out("a")
    assert(na == 4L && sa == 2.0 && ia == 1.0
      && ra == 1.0, out.toString)
    // constant y: num = 0 ⇒ slope 0; intercept = ȳ; dy = 0 ⇒ r² NULL
    val (nb, sb, ib, rb) = out("b")
    assert(nb == 3L && sb == 0.0 && ib == 4.25
      && rb == null, out.toString)
  }

  test("groupRegression: hand-computed non-trivial fit — y=(1,2,2,4) " +
      "on x=(0,1,2,3) gives slope 0.9, intercept 0.9, r² = 324/380; " +
      "zero-x-variance groups drop out") {
    // unit moments: n=4 Σx=6 Σxx=14 Σy=9 Σxy=18
    // num = 4·18−6·9 = 18; dx = 4·14−36 = 20; dy = 4·25−81… in cents:
    // num_c = 1800, dy_c = 4·250000−900² = 190000
    // slope = 18/20 = 0.9; intercept = (9·14−6·18)/20 = 18/20 = 0.9
    // r² = 1800²/(20·190000) = 324/380 = 0.8526315789…→ 0.852631579
    val df = Seq(
      ("g", 0L, 1.00), ("g", 1L, 2.00), ("g", 2L, 2.00), ("g", 3L, 4.00),
      ("z", 7L, 1.00), ("z", 7L, 2.00) // all x equal: dx = 0, drops
    ).toDF("grp", "x", "value")
    val out = Profiling.groupRegression(df, "grp", col("x"), "value")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("g"), out.toString)
    val (slope, icept, r2) = out("g")
    assert(slope == 0.9 && icept == 0.9, out.toString)
    assert(r2 == 0.852632, out.toString)
  }
}
