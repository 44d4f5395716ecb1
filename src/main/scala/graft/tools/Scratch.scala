package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe main (see .claude/skills/verify). */
object Scratch {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // bound AQE plan-description stringification: with deep lineage,
      // onUpdatePlan -> explainString is quadratic and can dominate the
      // driver (minutes of CPU inside StringConcat at toy data sizes)
      .config("spark.sql.maxPlanStringLength", "1048576").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GeoFunctions.register(spark)
    import spark.implicits._

    val cfg = graft.osm.OsmConfig.bus
    val world = graft.fixtures.SyntheticWorld.build(8, 12)
    val tb = graft.fixtures.WorldTables(spark, world)
    val bbox = graft.osm.GraphBuilder.feedBBox(tb.stops).pad(cfg.bboxPaddingM)
    val gt = graft.osm.GraphBuilder.build(spark, tb.osmNodes, tb.osmWays, tb.osmRels, bbox, cfg)
    val graph = graft.router.CompactGraph.fromEdges(gt.edges, gt.restrictions,
      gt.wayLines, gt.transitLines, gt.turnCycles)
    val cands = graft.router.Matcher.buildCandsWithStations(spark, tb.stops, gt.edges, gt.stations, cfg)
    val mr = graft.router.Matcher.matchTripsFull(spark,
      graft.fixtures.WorldTables.tripStops(tb), cands, graph, cfg)
    mr.shapes.cache().count()
    val hops = mr.hops.cache()
    println("[scratch] hops by reachable:")
    hops.groupBy($"reachable").count().show()
    // coverage distribution without threshold
    val colorOf = udf((c: String) => graft.functions.StringSim.parseHexColor(c))
    val hopEdges = hops.select($"trip_id", explode($"edge_ids").as("edge_id"))
    val withColor = hopEdges
      .join(gt.edges.select($"edge_id", $"way_id", $"len_m"), Seq("edge_id"))
      .join(gt.wayLines, Seq("way_id"))
      .join(gt.transitLines.select($"line_id", colorOf($"colour").as("color")), Seq("line_id"))
      .filter($"color" >= 0)
    val totals = hopEdges
      .join(gt.edges.select($"edge_id", $"len_m"), Seq("edge_id"))
      .groupBy($"trip_id").agg(sum($"len_m").as("total_m"))
    println("[scratch] per-trip color coverage:")
    withColor.groupBy($"trip_id", $"color").agg(sum($"len_m").as("color_m"))
      .join(totals, Seq("trip_id"))
      .withColumn("coverage", round($"color_m" / $"total_m", 3))
      .orderBy($"trip_id").show(20, false)
    println("[scratch] hop edge way breakdown:")
    hopEdges.join(gt.edges.select($"edge_id", $"way_id", $"len_m"), Seq("edge_id"))
      .groupBy($"way_id").agg(count(lit(1)).as("n"), sum($"len_m").as("len")).orderBy($"way_id").show(30)
    spark.stop()
  }
}
