package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch main: parity probe of DistGraphBuild vs the driver snap path on
  * the BENCH world (24x40, variedTrips) where the bench numbers diverged */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("scratch").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val cfg = graft.osm.OsmConfig.bus
    val world = graft.fixtures.SyntheticWorld.buildCached(24, 40,
      tripsPerRoute = 2, variedTrips = true)
    val t = graft.fixtures.WorldTables(spark, world)
    val bbox = graft.osm.GraphBuilder.feedBBox(t.stops).pad(cfg.bboxPaddingM)
    val gt = graft.osm.GraphBuilder.build(spark, t.osmNodes, t.osmWays,
      t.osmRels, bbox, cfg)

    val (refT, statsD) = graft.osm.StationSnap.refine(spark, gt, cfg, gt.blockers)
    val binDir = java.nio.file.Files.createTempDirectory("binsx").toString
    val dist = graft.router.DistGraphBuild.build(spark, gt, cfg, binDir)
    println(s"[scratch] nBins=${dist.nBins} statsDriver=$statsD statsDist=${dist.stats}")

    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select(concat_ws("|", $"edge_id", $"way_id", $"from_id", $"to_id",
          round($"len_m", 6), $"cost10", $"lvl", $"oneway"))
        .collect().map(_.getString(0)).sorted
    val d = sig(refT.edges); val x = sig(dist.edges)
    println(s"[scratch] edges driver=${d.length} dist=${x.length}")
    val dSet = d.toSet; val xSet = x.toSet
    (dSet -- xSet).take(5).foreach(s => println(s"[scratch] only-driver: $s"))
    (xSet -- dSet).take(5).foreach(s => println(s"[scratch] only-dist:   $s"))

    def ssig(df: org.apache.spark.sql.DataFrame) =
      df.select(concat_ws("|", $"node_id", round($"lat", 9), round($"lon", 9),
          coalesce($"name", lit("")), coalesce($"track", lit(""))))
        .collect().map(_.getString(0)).sorted
    val ds = ssig(refT.stations); val xs = ssig(dist.stations)
    println(s"[scratch] stations driver=${ds.length} dist=${xs.length}")
    (ds.toSet -- xs.toSet).take(5).foreach(s => println(s"[scratch] st only-driver: $s"))
    (xs.toSet -- ds.toSet).take(5).foreach(s => println(s"[scratch] st only-dist:   $s"))

    // full solve comparison, driver-built cands/graph vs dist-built
    val graphD = graft.router.CompactGraph.fromEdges(refT.edges, gt.restrictions,
      gt.wayLines, gt.transitLines, gt.turnCycles)
    val candsD = graft.router.Matcher.buildCandsWithStations(spark, t.stops,
      refT.edges, refT.stations, cfg).localCheckpoint()
    val candsX = graft.router.DistGraphBuild.tagCands(
      graft.router.Matcher.buildCandsWithStations(spark, t.stops,
        dist.edges, dist.stations, cfg), dist.edges).localCheckpoint()
    println(s"[scratch] cands driver=${candsD.count()} dist=${candsX.count()} " +
      s"untagged=${candsX.filter($"bin" < 0).count()}")
    val keyed = graft.router.Matcher.tripStopsWithKey(
      graft.fixtures.WorldTables.tripStops(t)).localCheckpoint()
    def sigSolve(df: org.apache.spark.sql.DataFrame) =
      df.select(concat_ws("|", $"seq_key", $"cost10", $"n_hops",
        $"n_unroutable")).collect().map(_.getString(0)).sorted
    graft.router.HopCache.clear()
    val solD = sigSolve(graft.router.Matcher.solveKeyedSeqs(spark, keyed, candsD,
      graft.router.GraphPartitions.single(spark, graphD), cfg))
    graft.router.HopCache.clear()
    val solX = sigSolve(graft.router.Matcher.solveKeyedSeqs(spark, keyed, candsX,
      dist.parts, cfg))
    println(s"[scratch] solves driver=${solD.length} dist=${solX.length} " +
      s"equal=${solD.sameElements(solX)}")
    (solD.toSet -- solX.toSet).take(3).foreach(s => println(s"[scratch] sol only-driver: $s"))
    (solX.toSet -- solD.toSet).take(3).foreach(s => println(s"[scratch] sol only-dist:   $s"))
    spark.stop()
  }
}
