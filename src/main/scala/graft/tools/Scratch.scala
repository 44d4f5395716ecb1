package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.{SyntheticWorld, WorldTables}
import graft.osm.{GraphBuilder, OsmConfig}
import graft.router.{CompactGraph, Matcher}
/** Scratch driver for manual end-to-end verification (kept out of tests). */
object Scratch {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[" + sys.env.getOrElse("SC_CORES", "32") + "]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SC_CORES", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = OsmConfig.bus
    val world = SyntheticWorld.build(48, 96, tripsPerRoute = 900, variedTrips = true)
    val tt = WorldTables(spark, world)
    val bbox = GraphBuilder.feedBBox(tt.stops).pad(cfg.bboxPaddingM)
    val gt = GraphBuilder.build(spark, tt.osmNodes, tt.osmWays, tt.osmRels, bbox, cfg)
    gt.edges.cache().count()
    val graph = t("graph_collect")(CompactGraph.fromEdges(gt.edges, gt.restrictions))
    val cands = t("cands")({ val c = Matcher.buildCands(spark, tt.stops, gt.edges, cfg).cache(); c.count(); c })
    val tripStops = WorldTables.tripStops(tt)
    // sub-steps of matchTripsFull
    val keyed = t("tripStopsWithKey+cache")({ val k = Matcher.tripStopsWithKey(tripStops).cache(); k.count(); k })
    val candCollect = t("cands_collect")(cands.collect().length)
    val solved = t("kernel_solve")({ val s = Matcher.solveKeyedSeqs(spark, keyed, cands, graph, cfg).cache(); s.count(); s })
    val seqKeys = keyed.select($"trip_id", $"seq_key").distinct()
    val joined = t("join_back")({ val j = seqKeys.join(solved, Seq("seq_key"))
      .select($"trip_id".as("shape_id"), explode($"points").as("pt"))
      .select($"shape_id", $"pt.seq".as("seq"), $"pt.lat".as("lat"), $"pt.lng".as("lng")).cache(); j.count(); j })
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"shape_id").orderBy($"seq")
    t("measure_window")({
      joined.withColumn("prev_lat", lag($"lat", 1).over(w))
        .withColumn("prev_lng", lag($"lng", 1).over(w))
        .withColumn("seg_m", when($"prev_lat".isNull, lit(0.0))
          .otherwise(graft.functions.GeoFunctions.haversineM($"prev_lat", $"prev_lng", $"lat", $"lng")))
        .withColumn("travel_dist", sum($"seg_m").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .count()
    })
    println(s"cands rows=$candCollect")
    println(f"[t] kernel cumulative: ${graft.router.MatcherKernel.KernelNanos.sum() / 1e9}%.2f s over ${graft.router.MatcherKernel.KernelSolves.sum()} solves")
    spark.stop()
  }
}
