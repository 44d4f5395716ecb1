package graft

import org.scalatest.funsuite.AnyFunSuite

/** The fully-wired flagship pipeline (SparkEntry.entry ->
  * PipelineQueries.artifacts): every shelf operator must actually run and
  * produce non-trivial output, and the snapshot checkpoints must exist. */
class FlagshipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val a = {
    graft.functions.GeoFunctions.register(spark)
    graft.queries.PipelineQueries.artifacts(spark)
  }

  test("flagship entry produces shapes") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("color vote yields a winning color per matched trip") {
    val tc = a.tripColors
    assert(tc.count() > 0)
    // one winner per trip
    assert(tc.groupBy($"trip_id").count().filter($"count" > 1).count() == 0)
  }

  test("color vote golden: trips vote their route relation's colour exactly") {
    // the 8x12 world's bus rows carry one route relation each with colour
    // #ff0000 (r%3==0) or #0066cc — every matched trip must vote the colour
    // of ITS row (q_color_vote correctness beyond rows-only)
    val got = a.tripColors.select($"trip_id", $"color").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (tripId, color) =>
      val row = tripId.stripPrefix("T").takeWhile(_ != '_').toInt
      val expect = if (row % 3 == 0) 0xff0000 else 0x0066cc
      assert(color == expect, s"$tripId voted $color, expected $expect")
    }
  }

  test("route color consolidation covers every voted route") {
    val rc = a.routeColors
    assert(rc.count() > 0)
    // single-color routes keep their id
    assert(rc.filter($"route_id" === $"new_route_id").count() > 0)
  }

  test("route colors golden: consolidated colour + text colour per route") {
    // every route's voted colour is uniform -> new_route_id == route_id,
    // colour matches the row relation, text colour from luma (U12)
    val rows = a.routeColors
      .select($"route_id", $"new_route_id", $"color", $"text_color").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val route = r.getString(0).stripPrefix("R").toInt
      val expect = if (route % 3 == 0) 0xff0000 else 0x0066cc
      assert(r.getString(1) == r.getString(0), s"route ${r.getString(0)} split unexpectedly")
      assert(r.getInt(2) == expect)
      // both fixture colours are dark (luma < 140) -> white text (U12)
      assert(r.getInt(3) == 0xffffff)
    }
  }

  test("snapshot checkpoints written with per-partition lineage") {
    for (stage <- Seq("graph_edges", "cands")) {
      val m = graft.plans.Snapshots.readManifest("target/snapshots/pipeline", stage)
      assert(m.isDefined, s"manifest missing for $stage")
      assert(m.get.rows > 0 && m.get.partitions.nonEmpty)
    }
  }

  test("matched shapes are DP-simplified (no redundant collinear points)") {
    // the synthetic rows are straight lines: after 0.5 m DP the per-trip
    // point count must be far below the raw edge-expanded count
    val counts = a.shapes.groupBy($"shape_id").count().agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(counts < 40, s"max per-shape points $counts — DP not applied?")
  }
}
