package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geo
import graft.model._
import graft.osm.{GraphBuilder, OsmConfig, StationSnap, TagRule}

/** J4 snap-node insertion + edge splitting, J6 eq-station dedup, F4 snap
  * blockers (reference snapStation/eqStatReach/isBlocked,
  * /root/reference/src/pfaedle/osm/OsmBuilder.cpp:1153-1313). */
class SnapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val cfg = OsmConfig.bus.copy(
    stationBlockerRules = Seq(TagRule("barrier", "gate")))

  def mLat(m: Double): Double = m / Geo.MPerDeg
  def mLon(m: Double): Double = m / (Geo.MPerDeg * Geo.latLngDistFactor(48.0))

  /** one straight secondary way along lat=48.0, nodes every 200 m, plus the
    * given extra (non-way) nodes. */
  def world(extraNodes: Seq[OsmNode], nWayNodes: Int = 5,
            wayNodeTags: Map[Long, Map[String, String]] = Map.empty,
            extraWays: Seq[OsmWay] = Nil): GraphBuilder.GraphTables = {
    val wayNodes = (0 until nWayNodes).map { i =>
      OsmNode(i + 1L, 48.0, 7.8 + mLon(i * 200.0),
        wayNodeTags.getOrElse(i + 1L, Map.empty))
    }
    val nodes = wayNodes ++ extraNodes
    val ways = Seq(OsmWay(9000L, Map("highway" -> "secondary", "name" -> "Main St"),
      (1 to nWayNodes).map(_.toLong).toArray)) ++ extraWays
    val nodesDf = spark.createDataset(nodes).toDF()
    val waysDf = spark.createDataset(ways).toDF()
    val relsDf = spark.createDataset(Seq.empty[OsmRel]).toDF()
    val bbox = GraphBuilder.BBox(47.99, 7.79, 48.01, 7.83)
    GraphBuilder.build(spark, nodesDf, waysDf, relsDf, bbox, cfg)
  }

  test("J4: an orphan station inside snap range splits its edge at the projection") {
    // station 10 m south of the way, 300 m east of node 1 (mid-chain)
    val st = OsmNode(100L, 48.0 - mLat(10.0), 7.8 + mLon(300.0),
      Map("highway" -> "bus_stop", "name" -> "Alpha"))
    val gt = world(Seq(st))
    val (gt2, stats) = StationSnap.refine(spark, gt, cfg, gt.blockers)
    assert(stats.nSplit == 1 && stats.nAliased == 0)

    val parts = gt2.edges.filter($"from_id" === 100L || $"to_id" === 100L)
      .select($"edge_id", $"from_id", $"to_id", $"len_m", $"cost10", $"lvl")
      .collect().sortBy(_.getDouble(3))
    assert(parts.length == 2, s"expected 2 split parts, got ${parts.length}")
    // the way contracts to one 800 m edge; split at 300 m -> 300 + 500
    assert(math.abs(parts(0).getDouble(3) - 300.0) < 2.0)
    assert(math.abs(parts(1).getDouble(3) - 500.0) < 2.0)
    // costs re-derived from split length at the level speed (lvl 3 = 40 km/h)
    parts.foreach { p =>
      assert(p.getLong(4) ==
        Geo.costToInt(p.getDouble(3) / (cfg.levelSpeedsKmh(p.getInt(5)) / 3.6)))
    }
    // the station vertex sits ON the way (snapped), not at the orphan coords
    val stRow = gt2.stations.filter($"name" === "Alpha").head()
    assert(stRow.getLong(0) == 100L)
    assert(math.abs(stRow.getDouble(1) - 48.0) < 1e-9) // snapped onto lat 48
    // replaced edge is gone; total count grew by exactly one
    assert(gt2.edges.count() == gt.edges.count() + 1)
  }

  test("J6: two OSM nodes of one physical station produce ONE station vertex") {
    val s1 = OsmNode(100L, 48.0 - mLat(10.0), 7.8 + mLon(300.0),
      Map("highway" -> "bus_stop", "name" -> "Alpha"))
    val s2 = OsmNode(101L, 48.0 - mLat(12.0), 7.8 + mLon(310.0),
      Map("highway" -> "bus_stop", "name" -> "Alpha"))
    val gt = world(Seq(s1, s2))
    val (gt2, stats) = StationSnap.refine(spark, gt, cfg, gt.blockers)
    assert(stats.nSplit == 1, s"one split expected, got ${stats.nSplit}")
    assert(stats.nAliased == 1, s"one alias expected, got ${stats.nAliased}")
    // both stations resolve to the same graph vertex
    val verts = gt2.stations.filter($"name" === "Alpha")
      .select($"node_id").distinct().collect().map(_.getLong(0))
    assert(verts.length == 1 && verts(0) == 100L)
  }

  test("F4: a blocker node at the projection point vetoes the snap") {
    // gate ON the way at 400 m (node 3); station 10 m south of the gate —
    // the projection lands within maxBlockDistanceM of the blocker vertex
    val st = OsmNode(100L, 48.0 - mLat(10.0), 7.8 + mLon(400.0),
      Map("highway" -> "bus_stop", "name" -> "Alpha"))
    val gt = world(Seq(st), wayNodeTags = Map(3L -> Map("barrier" -> "gate")))
    assert(gt.blockers.count() == 1)
    val (gt2, stats) = StationSnap.refine(spark, gt, cfg, gt.blockers)
    assert(stats.nSplit == 0 && stats.nEndpoint == 0,
      s"blocked snap must not split: $stats")
    // the station stays off-graph at its original position
    val stRow = gt2.stations.filter($"name" === "Alpha").head()
    assert(stRow.getLong(0) == 100L)
    assert(stRow.getDouble(1) < 48.0 - mLat(9.0))
    assert(gt2.edges.count() == gt.edges.count())
  }

  test("U6: platform_code resolves same-name stations to the matching track") {
    // two platforms of one station: same name, local_ref 1 at 300 m and
    // local_ref 2 at 500 m; the stop carries platform_code 2 but sits
    // NEARER to platform 1 — track match must beat distance
    val p1 = OsmNode(100L, 48.0 - mLat(10.0), 7.8 + mLon(300.0),
      Map("highway" -> "bus_stop", "name" -> "Alpha", "local_ref" -> "1"))
    val p2 = OsmNode(101L, 48.0 - mLat(10.0), 7.8 + mLon(500.0),
      Map("highway" -> "bus_stop", "name" -> "Alpha", "local_ref" -> "2"))
    val gt = world(Seq(p1, p2))
    val (gt2, stats) = graft.osm.StationSnap.refine(spark, gt, cfg, gt.blockers)
    assert(stats.nSplit == 2, s"$stats")
    assert(gt2.stations.filter($"track" === "2").count() == 1)
    val stops = spark.createDataset(Seq(
      GtfsStop("S1", "Alpha", 48.0 - mLat(12.0), 7.8 + mLon(350.0), "2", "", 0))).toDF()
    val cands = graft.router.Matcher.buildCandsWithStations(
      spark, stops, gt2.edges, gt2.stations, cfg).collect()
    // snap position lands on the matching-track vertex (platform 2, 500 m)
    val lon500 = 7.8 + mLon(500.0)
    assert(cands.exists(r => math.abs(r.getAs[Double]("py") - 48.0) < 1e-9 &&
      math.abs(r.getAs[Double]("px") - lon500) < 1e-9))
    // the candidate touching ONLY the wrong-track platform pays the
    // platform-unmatched penalty on top of its distance emission
    val e1 = gt2.edges.filter(($"from_id" === 100L || $"to_id" === 100L) &&
      $"from_id" =!= 101L && $"to_id" =!= 101L).select($"edge_id").head().getLong(0)
    val c1 = cands.find(_.getAs[Long]("edge_id") == e1).get
    val emit = math.ceil(c1.getAs[Double]("dist_m") * cfg.distPenFactor * 10.0).toLong
    assert(c1.getAs[Long]("pen10") == emit +
      Geo.costToInt(cfg.platformUnmatchedPenaltySec))
  }

  test("J4: a projection within 0.5 m of an existing vertex reuses that vertex") {
    // station 10 m exactly south of way node 2 (at 200 m): projection = node 2.
    // A crossing street keeps node 2 an intersection (contraction would
    // otherwise swallow it — the recast snaps on the contracted graph).
    val st = OsmNode(100L, 48.0 - mLat(10.0), 7.8 + mLon(200.0),
      Map("highway" -> "bus_stop", "name" -> "Alpha"))
    // crossing street only to the NORTH: the station (south) must not
    // simply snap onto the crossing way instead
    val cross = Seq(OsmNode(200L, 48.0 + mLat(200.0), 7.8 + mLon(200.0), Map.empty))
    val gt = world(Seq(st) ++ cross,
      extraWays = Seq(OsmWay(9001L, Map("highway" -> "residential"),
        Array(200L, 2L))))
    val (gt2, stats) = StationSnap.refine(spark, gt, cfg, gt.blockers)
    assert(stats.nEndpoint == 1 && stats.nSplit == 0, s"$stats")
    val stRow = gt2.stations.filter($"name" === "Alpha").head()
    assert(stRow.getLong(0) == 2L) // placed at the existing way node
    assert(gt2.edges.count() == gt.edges.count())
  }
}
