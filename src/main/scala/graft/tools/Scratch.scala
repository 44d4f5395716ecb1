package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.{SyntheticWorld, WorldTables}
import graft.osm.{GraphBuilder, OsmConfig}
import graft.router.{CompactGraph, Matcher}
/** Scratch driver for manual end-to-end verification (kept out of tests). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GeoFunctions.register(spark)
    val world = SyntheticWorld.build(rows = 8, cols = 12)
    val t = WorldTables(spark, world)
    val cfg = OsmConfig.bus
    val bbox = GraphBuilder.feedBBox(t.stops).pad(cfg.bboxPaddingM)
    val gt = GraphBuilder.build(spark, t.osmNodes, t.osmWays, t.osmRels, bbox, cfg)
    val graph = CompactGraph.fromEdges(gt.edges, gt.restrictions)
    val cands = Matcher.buildCands(spark, t.stops, gt.edges, cfg)
    println("=== cands for S2_0 / S2_9 ===")
    cands.filter($"stop_id".isin("S2_0", "S2_9")).orderBy($"stop_id", $"dist_m").show(20, false)
    val ts = WorldTables.tripStops(t).filter($"trip_id" === "T2_0")
    val shapes = Matcher.matchTrips(spark, ts, cands, graph, cfg)
    println("=== shape T2_0 ===")
    shapes.orderBy($"seq").show(60, false)
    spark.stop()
  }
}
