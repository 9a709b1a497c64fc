package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator surface lives in the `graft.queries` modules; this
  * object only aggregates the named query catalog and its DuckDB
  * oracle SQL.
  */
object SparkEntry {

  /** the full catalog, in module order. */
  def catalog: Seq[QueryDef] =
    CoreOps.defs ++ ScalarOps.defs ++ AnalyticsOps.defs ++ TextOps.defs ++
      SimilarityOps.defs ++ MultimodalOps.defs ++ TemporalOps.defs ++
      ExtendedOps.defs ++ LayoutOps.defs ++ PipelineOps.defs ++
      GraphOps.defs ++ SketchOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check). */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
