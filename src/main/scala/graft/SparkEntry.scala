package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.Archive
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each module under `graft.queries` contributes
  * (name → query) plus a DuckDB oracle twin; names are stable across
  * rounds. Column names are aliased identically in the Spark plan and the
  * oracle SQL (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows > 0):
    * the reference's entire archival pipeline (SURVEY §3.1) as one
    * declarative plan — filter(ts<cutoff) → distributed top-k → stamp →
    * union → per-row year/month partition derivation.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val iot = RefQueries.eventsAsIotBefore(spark, d, RefQueries.Cutoff)
    Archive.archivePipeline(
      Seq("iot_data" -> iot.filter(col("id") % 2 === 0),
          "iot_metrics" -> iot.filter(col("id") % 2 === 1)),
      "timestamp", "id", RefQueries.Cutoff, 100)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.defs ++ RelationalQueries.defs ++ TpchQueries.defs ++ ExtQueries.defs ++ StatsQueries.defs ++ ShapeQueries.defs ++ FuncQueries.defs ++ CorpusQueries.defs ++ PipelineQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (non-SQL-expressible ops) get
    * the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    RefQueries.oracles ++ RelationalQueries.oracles ++ TpchQueries.oracles ++ ExtQueries.oracles ++ StatsQueries.oracles ++ ShapeQueries.oracles ++ FuncQueries.oracles ++ CorpusQueries.oracles ++ PipelineQueries.oracles
}
