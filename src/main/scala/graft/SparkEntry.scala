package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the FULL map-matching pipeline on the deterministic synthetic
    * world — trip eligibility, outlier-free bbox, graph build with the G8
    * post-processing passes, station-aware candidate join, Viterbi match
    * with DP-simplified output shapes, color vote/consolidation, snapshot
    * checkpoints (see PipelineQueries.artifacts). Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GeoFunctions.register(spark)
    graft.queries.PipelineQueries.artifacts(spark).shapes
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GraftQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys -> rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.GraftQueries.oracleSql
}
