package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SyntheticWorld -> Spark DataFrames. */
object WorldTables {
  case class Tables(osmNodes: DataFrame, osmWays: DataFrame, osmRels: DataFrame,
                    stops: DataFrame, routes: DataFrame, trips: DataFrame,
                    stopTimes: DataFrame, truthShapes: DataFrame)

  def apply(spark: SparkSession, w: SyntheticWorld.World): Tables = {
    import spark.implicits._
    Tables(
      osmNodes = w.nodes.toDF(),
      osmWays = w.ways.toDF(),
      osmRels = w.rels.toDF(),
      stops = w.stops.toDF(),
      routes = w.routes.toDF(),
      trips = w.trips.toDF(),
      stopTimes = w.stopTimes.toDF(),
      truthShapes = w.truthShapes.toDF())
  }

  /** J7: trip_id -> ordered stop rows with coordinates + line identity. */
  def tripStops(t: Tables): DataFrame = {
    import t.stopTimes.sparkSession.implicits._
    t.stopTimes
      .join(t.stops.select($"stop_id", $"lat", $"lng"), Seq("stop_id"))
      .join(t.trips.select($"trip_id", $"trip_short_name".as("line_name")), Seq("trip_id"))
      .select($"trip_id", $"seq", $"stop_id", $"arr_s", $"dep_s", $"lat", $"lng",
        $"line_name")
  }
}
