package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serial in-process reproduction of the bench-world cluster solves —
  * mirrors solveSeqs' exact grouping (salt grain, cluster toNames,
  * relative-time normalization) but calls MatcherKernel.solveCluster
  * directly with per-group timing, so a pathologically slow group names
  * itself. SPARK_GRAFT_SHUFFLE_SEED permutes the within-group sequence
  * order to probe order-dependence. */
object KernelRepro {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "96").toInt
    val cols = sys.env.getOrElse("SPARK_GRAFT_COLS", "192").toInt
    val tpr = sys.env.getOrElse("SPARK_GRAFT_TPR", "4500").toInt
    val targetGroups = sys.env.getOrElse("SPARK_GRAFT_TARGET_GROUPS", "32").toLong
    val shuffleSeed = sys.env.get("SPARK_GRAFT_SHUFFLE_SEED").map(_.toLong)

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GeoFunctions.register(spark)
    import spark.implicits._
    val cfg = graft.osm.OsmConfig.bus

    val world = graft.fixtures.SyntheticWorld.buildCached(rows, cols,
      tripsPerRoute = tpr, variedTrips = true)
    val t = graft.fixtures.WorldTables(spark, world)
    val bbox = graft.osm.GraphBuilder.feedBBox(t.stops).pad(cfg.bboxPaddingM)
    val gt0 = graft.osm.GraphBuilder.build(spark, t.osmNodes, t.osmWays, t.osmRels, bbox, cfg)
    gt0.edges.cache()
    val gt = graft.osm.StationSnap.refine(spark, gt0, cfg, gt0.blockers)._1
    val graph = graft.router.CompactGraph.fromEdges(gt.edges, gt.restrictions,
      gt.wayLines, gt.transitLines, gt.turnCycles)
    val cands = graft.router.Matcher.buildCandsWithStations(
      spark, t.stops, gt.edges, gt.stations, cfg)
    val candMap: Map[String, Array[(Long, Double, Long, Double, Double, Int)]] =
      cands.select($"stop_id", $"edge_id", $"progr", $"pen10",
        $"py", $"px", $"oneway").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getInt(6))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }

    // the partitioned-graph path solveSeqs actually takes
    val parts = graft.router.GraphPartitions.build(spark, graph)
    println(s"[repro] bins=${parts.bins.length}")

    // distinct sequences with relative times — matches solveSeqs' input
    val (seqKeysDf, distinct0) = graft.router.Matcher.tripSeqTables(
      graft.fixtures.WorldTables.tripStops(t))
    val distinct = distinct0
      .withColumn("t0", $"stops"(0).getField("dep_s"))
      .withColumn("stops", expr(
        "transform(stops, x -> struct(x.seq as seq, x.stop_id as stop_id, " +
          "cast(x.arr_s - t0 as int) as arr_s, cast(x.dep_s - t0 as int) as dep_s, " +
          "x.lat as lat, x.lng as lng))"))
      .select($"seq_key", coalesce($"line_name", lit("")).as("line_name"),
        $"stops", coalesce($"from_name", lit("")).as("from_name"),
        coalesce($"to_name", lit("")).as("to_name"))
      .as[(String, String, Seq[graft.router.Matcher.TS], String, String)]
      .collect()
    println(s"[repro] distinct seqs=${distinct.length} graph edges=${graph.numEdges}")

    // cluster exactly like solveSeqs: (line, first stop), salt by grain
    val byCluster = distinct.groupBy(d => (d._2, d._3.head.stop_id))
    val totalSeqs = distinct.length.toLong
    val grain = math.max(graft.router.Matcher.MaxSeqsPerGroup.toLong,
      (totalSeqs + targetGroups - 1) / targetGroups).toDouble
    println(s"[repro] clusters=${byCluster.size} grain=$grain")
    val t0 = System.nanoTime()
    for (((line, stop0), members0) <- byCluster.toSeq.sortBy(_._1.toString)) {
      val toNames = members0.map(_._5).distinct.sorted.toArray
      val fromName = members0.head._4
      val nSub = math.max(1L, math.ceil(members0.length / grain).toLong)
      val bySalt = members0.groupBy(d =>
        math.floorMod(scala.util.hashing.MurmurHash3.stringHash(d._1).toLong, nSub))
      for ((salt, members1) <- bySalt.toSeq.sortBy(_._1)) {
        val members = shuffleSeed match {
          case Some(s) => new scala.util.Random(s ^ salt).shuffle(members1.toSeq).toArray
          case None => members1
        }
        val g0 = System.nanoTime()
        val it0 = graft.router.Dijkstra.Iters.sum()
        // resolve the group's graph exactly like the cogroup closure does
        val candEdges = members.flatMap(_._3.map(_.stop_id)).distinct
          .flatMap(sid => candMap.getOrElse(sid, Array.empty).map(_._1))
        val gg = parts.resolve(candEdges)
        val res = graft.router.MatcherKernel.solveCluster(line, fromName, toNames,
          members.map(d => (d._1, d._3.toArray)), gg, candMap, cfg)
        val sec = (System.nanoTime() - g0) / 1e9
        val iters = graft.router.Dijkstra.Iters.sum() - it0
        if (sec > 5.0)
          println(f"[repro] SLOW group line=$line stop0=$stop0 salt=$salt " +
            f"seqs=${members.length} sec=$sec%.1f iters=$iters " +
            f"gEdges=${gg.numEdges} gTok=${gg.token}")
        else
          println(f"[repro] group line=$line salt=$salt seqs=${members.length} " +
            f"sec=$sec%.2f iters=$iters solved=${res.length} gTok=${gg.token}")
      }
    }
    println(f"[repro] TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"iters=${graft.router.Dijkstra.Iters.sum()}")
  }
}
