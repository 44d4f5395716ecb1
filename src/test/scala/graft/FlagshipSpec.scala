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

  test("route color consolidation covers every voted route") {
    val rc = a.routeColors
    assert(rc.count() > 0)
    // single-color routes keep their id
    assert(rc.filter($"route_id" === $"new_route_id").count() > 0)
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
