package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dominance / frontier ranking operators. */
object Ranking {

  /** 2-D skyline (Pareto frontier): rows not dominated on
    * (minimize `costCol`, maximize `gainCol`). Row p is dominated if
    * some q has cost ≤ p.cost AND gain ≥ p.gain with at least one
    * strict — the classic best-tradeoff query (cheapest parts offering
    * the largest size, fastest runs with the highest score) that a
    * naive NOT EXISTS turns into an all-pairs O(n²) self-join.
    *
    * Exact O(n log n) shape instead: collapse to one row per distinct
    * cost keeping the max gain at that cost (two-phase agg), then one
    * running max over costs sorted ascending with ROWS … 1 PRECEDING —
    * a row survives iff its gain equals its cost-group's max AND
    * strictly exceeds every cheaper group's best gain. Ties on both
    * axes: mutually non-dominating duplicates all survive (dominance
    * requires one STRICT inequality).
    *
    * Scale shape: the only global structure is the running max over
    * DISTINCT COST VALUES — a frame bounded by value cardinality, not
    * row count, after the corpus collapses in a map-side-combined agg;
    * the frontier flags broadcast back onto rows via an equi-join on
    * cost. The single-partition window is over the collapsed group
    * frame only (same economics as q_chi_square's cell-grid windows).
    * All comparisons are on raw column values — no arithmetic at all,
    * so nothing to round.
    */
  def skyline(df: DataFrame, costCol: Column, gainCol: Column,
      keep: Seq[Column]): DataFrame = {
    val rows = df.select(keep :+ costCol.as("cost") :+ gainCol.as("gain"): _*)
    val best = rows.groupBy(col("cost")).agg(max(col("gain")).as("gmax"))
    val w = Window.orderBy(col("cost"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = best
      .withColumn("prevmax", max(col("gmax")).over(w))
      // survives cheaper groups iff strictly better than all of them
      .filter(col("prevmax").isNull || col("prevmax") < col("gmax"))
      .select(col("cost"), col("gmax"))
    rows.join(broadcast(frontier), Seq("cost"))
      .filter(col("gain") === col("gmax"))
      .drop("gmax")
  }
}
