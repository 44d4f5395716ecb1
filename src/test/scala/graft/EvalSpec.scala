package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.eval.Shapevl
import graft.fixtures.{SyntheticWorld, WorldTables}
import graft.geo.Geo
import graft.osm.{GraphBuilder, OsmConfig}
import graft.router.{CompactGraph, Matcher}

class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("scoreTrip: identical shapes -> an=0, detour -> unmatched segment") {
    val truth = (0 to 10).map(i => (48.0, 7.8 + i * 0.002, i * 0.002 * Geo.MPerDeg *
      Geo.latLngDistFactor(48.0))).toArray
    val anchors = Array(truth(0)._3, truth(5)._3, truth(10)._3)
    val same = Shapevl.scoreTrip("t", truth, truth, anchors)
    assert(!same.skipped && same.an == 0.0 && same.avg_fd < 1.0)

    // detour: shift the middle third 200 m north -> first segment unmatched
    val detour = truth.zipWithIndex.map { case ((la, lo, d), i) =>
      if (i >= 2 && i <= 4) (la + 200.0 / Geo.MPerDeg, lo, d) else (la, lo, d)
    }
    val det = Shapevl.scoreTrip("t", truth, detour, anchors)
    assert(det.an == 0.5 && det.al == 0.5, s"an=${det.an} al=${det.al}")

    // degenerate: too short
    val skp = Shapevl.scoreTrip("t", truth.take(1), truth, anchors)
    assert(skp.skipped)
  }

  test("end-to-end accuracy: matched shapes score an_0 = 1.0 vs ground truth") {
    val world = SyntheticWorld.build(rows = 8, cols = 12)
    val t = WorldTables(spark, world)
    val cfg = OsmConfig.bus
    val bbox = GraphBuilder.feedBBox(t.stops).pad(cfg.bboxPaddingM)
    val gt = GraphBuilder.build(spark, t.osmNodes, t.osmWays, t.osmRels, bbox, cfg)
    val graph = CompactGraph.fromEdges(gt.edges, gt.restrictions)
    val cands = Matcher.buildCands(spark, t.stops, gt.edges, cfg)
    val mr = Matcher.matchTripsFull(spark, WorldTables.tripStops(t), cands, graph, cfg)
    val (gen, anchors) = (mr.shapes, mr.anchors)

    // truth shapes are per route ("SHP_R<r>"): key them by trip
    val truthByTrip = t.trips.select($"trip_id", $"route_id")
      .join(t.truthShapes.withColumn("route_id",
        regexp_replace($"shape_id", "SHP_R", "R")), Seq("route_id"))
      .select($"trip_id".as("shape_id"), $"seq", $"lat", $"lng",
        $"travel_dist")
    val stopDists = t.stopTimes.select($"trip_id", $"seq", $"shape_dist")
    // generated anchors: measure of the shape at each stop's snap point
    val stopDistsGen = anchors
      .join(gen, anchors("trip_id") === gen("shape_id") &&
        anchors("point_seq") === gen("seq"))
      .select(anchors("trip_id"), $"stop_idx".as("seq"),
        $"travel_dist".as("shape_dist"))

    val scores = Shapevl.evaluate(spark, truthByTrip, gen, stopDists, stopDistsGen).cache()
    assert(scores.count() == t.trips.count())
    assert(scores.filter($"skipped").count() == 0)
    val bad = scores.filter($"an" > 0.0)
    assert(bad.count() == 0, s"trips with unmatched segments: ${bad.collect().mkString}")

    val rep = Shapevl.report(scores).head()
    assert(rep.getAs[Double]("an_0") == 1.0)
    assert(rep.getAs[Double]("avg_frechet") < 50.0)
  }
}
