package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SyntheticWorld -> Spark DataFrames.
  *
  * Tables go through sc.parallelize, NOT Seq.toDF: toDF embeds every row
  * as a literal LocalRelation inside the logical plan — at bench world
  * sizes that made MULTI-MEGABYTE plans (11.7M chars at 96x192/tpr900)
  * that every optimizer pass and AQE update re-walked. */
object WorldTables {
  case class Tables(osmNodes: DataFrame, osmWays: DataFrame, osmRels: DataFrame,
                    stops: DataFrame, routes: DataFrame, trips: DataFrame,
                    stopTimes: DataFrame, truthShapes: DataFrame)

  def apply(spark: SparkSession, w: SyntheticWorld.World): Tables = {
    import spark.implicits._
    def dist[T: org.apache.spark.sql.Encoder : scala.reflect.ClassTag](s: Seq[T]): DataFrame = {
      val slices = math.min(spark.sparkContext.defaultParallelism,
        math.max(1, s.length / 10000))
      spark.createDataset(spark.sparkContext.parallelize(s, slices)).toDF()
    }
    Tables(
      osmNodes = dist(w.nodes),
      osmWays = dist(w.ways),
      osmRels = dist(w.rels),
      stops = dist(w.stops),
      routes = dist(w.routes),
      trips = dist(w.trips),
      stopTimes = dist(w.stopTimes),
      truthShapes = dist(w.truthShapes))
  }

  /** J7: trip_id -> ordered stop rows with coordinates + line identity. */
  def tripStops(t: Tables): DataFrame = {
    import t.stopTimes.sparkSession.implicits._
    t.stopTimes
      .join(t.stops.select($"stop_id", $"name".as("stop_name"), $"lat", $"lng"),
        Seq("stop_id"))
      .join(t.trips.select($"trip_id", $"trip_short_name".as("line_name")), Seq("trip_id"))
      .select($"trip_id", $"seq", $"stop_id", $"arr_s", $"dep_s", $"lat", $"lng",
        $"line_name", $"stop_name")
  }
}
