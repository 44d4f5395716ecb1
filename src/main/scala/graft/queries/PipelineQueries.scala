package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.Shapevl
import graft.fixtures.{SyntheticWorld, WorldTables}
import graft.images.ImageFixtures
import graft.osm.{GraphBuilder, OsmConfig}
import graft.overlay.ImageOverlay
import graft.router.{CompactGraph, Matcher}

/** The map-matching / overlay / eval pipeline exposed as driver queries.
  * These are the graph+routing kernels — not SQL-expressible, so they ship
  * without oracles (rows-only check); their exactness is asserted by the
  * golden ScalaTest suites (PipelineSpec, EvalSpec, OverlaySpec) instead.
  * Inputs are the deterministic synthetic world (seeded; no external data),
  * independent of the sf dir. */
object PipelineQueries {
  import GraftQueries.Q

  case class Artifacts(shapes: DataFrame, anchors: DataFrame, scores: DataFrame,
                       assigned: DataFrame, verified: DataFrame)

  @volatile private var cache: (SparkSession, Artifacts) = null

  def artifacts(spark: SparkSession): Artifacts = synchronized {
    if (cache != null && (cache._1 eq spark)) return cache._2
    import spark.implicits._
    val world = SyntheticWorld.build(rows = 8, cols = 12)
    val t = WorldTables(spark, world)
    val cfg = OsmConfig.bus
    val bbox = GraphBuilder.feedBBox(t.stops).pad(cfg.bboxPaddingM)
    val gt = GraphBuilder.build(spark, t.osmNodes, t.osmWays, t.osmRels, bbox, cfg)
    val graph = CompactGraph.fromEdges(gt.edges, gt.restrictions,
      gt.wayLines, gt.transitLines)
    val cands = Matcher.buildCands(spark, t.stops, gt.edges, cfg)
    val (shapes0, anchors) =
      Matcher.matchTripsFull(spark, WorldTables.tripStops(t), cands, graph, cfg)
    val shapes = shapes0.cache()

    val truthByTrip = t.trips.select($"trip_id", $"route_id")
      .join(t.truthShapes.withColumn("route_id",
        regexp_replace($"shape_id", "SHP_R", "R")), Seq("route_id"))
      .select($"trip_id".as("shape_id"), $"seq", $"lat", $"lng", $"travel_dist")
    val stopDists = t.stopTimes.select($"trip_id", $"seq", $"shape_dist")
    val stopDistsGen = anchors
      .join(shapes, anchors("trip_id") === shapes("shape_id") &&
        anchors("point_seq") === shapes("seq"))
      .select(anchors("trip_id"), $"stop_idx".as("seq"), $"travel_dist".as("shape_dist"))
    val scores = Shapevl.evaluate(spark, truthByTrip, shapes, stopDists, stopDistsGen)

    val images = ImageFixtures.build(world, cfg.cellRes).toDF()
    val assigned = ImageOverlay.assign(images, shapes, cfg.cellRes)
    val verified = ImageOverlay.verify(spark, images)
    val a = Artifacts(shapes, anchors, scores, assigned, verified)
    cache = (spark, a)
    a
  }

  val all: Map[String, Q] = Map(
    // matched shapes, coordinates rounded for a stable dump
    "q_match_shapes" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      artifacts(s).shapes
        .select($"shape_id", $"seq",
          round($"lat", 7).as("lat"), round($"lng", 7).as("lng"),
          round($"travel_dist", 1).as("travel_dist"))
        .orderBy($"shape_id", $"seq")
    }),
    // shapevl accuracy scores per trip
    "q_shapevl_scores" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      artifacts(s).scores
        .select($"trip_id", round($"an", 4).as("an"), round($"al", 4).as("al"),
          round($"avg_fd", 1).as("avg_fd"), $"n_segs", $"skipped")
        .orderBy($"trip_id")
    }),
    // raster->vector tile assignments
    "q_tile_assign" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      artifacts(s).assigned
        .select($"image_id", $"shape_id", $"cell")
        .orderBy($"image_id", $"shape_id")
    }),
    // payload verification stats (input_hint invariant)
    "q_tile_verify" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      artifacts(s).verified
        .groupBy($"fmt")
        .agg(count(lit(1)).as("n"),
          sum(when($"psnr_ok", 1L).otherwise(0L)).as("n_psnr_ok"),
          sum(when($"phash_ok", 1L).otherwise(0L)).as("n_phash_ok"),
          sum(when($"caption_ok", 1L).otherwise(0L)).as("n_caption_ok"))
        .orderBy($"fmt")
    }))
}
