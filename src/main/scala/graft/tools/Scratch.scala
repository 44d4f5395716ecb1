package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.{SyntheticWorld, WorldTables}
import graft.osm.{GraphBuilder, OsmConfig}
import graft.router.{CompactGraph, Matcher}
import graft.eval.Shapevl
import graft.geo.Geo
/** Scratch driver for manual end-to-end verification (kept out of tests). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val world = SyntheticWorld.build(rows = 8, cols = 12)
    val t = WorldTables(spark, world)
    val cfg = OsmConfig.bus
    val bbox = GraphBuilder.feedBBox(t.stops).pad(cfg.bboxPaddingM)
    val gt = GraphBuilder.build(spark, t.osmNodes, t.osmWays, t.osmRels, bbox, cfg)
    val graph = CompactGraph.fromEdges(gt.edges, gt.restrictions)
    val cands = Matcher.buildCands(spark, t.stops, gt.edges, cfg)
    val gen = Matcher.matchTrips(spark, WorldTables.tripStops(t), cands, graph, cfg)

    val truth = world.truthShapes.filter(_.shape_id == "SHP_R2")
      .sortBy(_.seq).map(p => (p.lat, p.lng, p.travel_dist.toDouble)).toArray
    val genArr = gen.filter($"shape_id" === "T2_0").orderBy($"seq")
      .select($"lat", $"lng", $"travel_dist").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getFloat(2).toDouble))
    println(s"truth pts: ${truth.take(3).mkString(" ")}")
    println(s"gen pts: ${genArr.take(3).mkString(" ")}")
    val anchors = Array(0.0, 600.0, 1200.0, 1800.0)
    println(Shapevl.scoreTrip("T2_0", truth, genArr, anchors))
    // raw frechet of full lines
    println("full fd = " + Geo.frechetDistHav(truth.map(p => (p._1, p._2)),
      genArr.map(p => (p._1, p._2)), 25.0))
    spark.stop()
  }
}
