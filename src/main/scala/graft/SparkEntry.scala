package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fixtures.{SyntheticWorld, WorldTables}
import graft.osm.{GraphBuilder, OsmConfig}
import graft.router.{CompactGraph, Matcher}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full map-matching pipeline on the deterministic synthetic
    * world (OSM grid -> transit graph -> k-ring candidate join -> Viterbi ->
    * shapes). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GeoFunctions.register(spark)
    val world = SyntheticWorld.build(rows = 8, cols = 12)
    val t = WorldTables(spark, world)
    val cfg = OsmConfig.bus
    val bbox = GraphBuilder.feedBBox(t.stops).pad(cfg.bboxPaddingM)
    val gt = GraphBuilder.build(spark, t.osmNodes, t.osmWays, t.osmRels, bbox, cfg)
    val graph = CompactGraph.fromEdges(gt.edges, gt.restrictions,
      gt.wayLines, gt.transitLines)
    val cands = Matcher.buildCands(spark, t.stops, gt.edges, cfg)
    Matcher.matchTrips(spark, WorldTables.tripStops(t), cands, graph, cfg)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GraftQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys -> rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.GraftQueries.oracleSql
}
