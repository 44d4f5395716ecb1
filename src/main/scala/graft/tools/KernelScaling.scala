package graft.tools

/** Kernel-stage scaling only (fast, in-process): alternating pools at n and
  * 4n threads, several reps, min + median reported. */
object KernelScaling {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = ScalingBench.session(8)
    val (graph, candMap, seqs) = try {
      import spark.implicits._
      val cfg = graft.osm.OsmConfig.bus
      val world = graft.fixtures.SyntheticWorld.build(96, 192,
        tripsPerRoute = 400, variedTrips = true)
      val t = graft.fixtures.WorldTables(spark, world)
      val bbox = graft.osm.GraphBuilder.feedBBox(t.stops).pad(cfg.bboxPaddingM)
      val gt = graft.osm.GraphBuilder.build(spark, t.osmNodes, t.osmWays, t.osmRels, bbox, cfg)
      val graph = graft.router.CompactGraph.fromEdges(gt.edges, gt.restrictions,
        gt.wayLines, gt.transitLines, gt.turnCycles)
      val cands = graft.router.Matcher.buildCands(spark, t.stops, gt.edges, cfg)
      val candMap = cands.select($"stop_id", $"edge_id", $"progr", $"pen10",
          $"py", $"px", $"oneway").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getInt(6))))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val seqs = graft.router.Matcher.tripStopsWithKey(
          graft.fixtures.WorldTables.tripStops(t))
        .dropDuplicates("seq_key").select($"seq_key", $"line_name", $"stops")
        .as[(String, String, Seq[graft.router.Matcher.TS])].collect()
      (graph, candMap, seqs)
    } finally spark.stop()
    val cfg = graft.osm.OsmConfig.bus

    def runPool(par: Int): Double = {
      graft.router.HopCache.clear()
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      seqs.foreach { case (k, ln, st) =>
        pool.submit(new Runnable { def run(): Unit = {
          graft.router.MatcherKernel.solveOne(k, ln, st.toArray, graph, candMap, cfg); () } })
      }
      pool.shutdown()
      pool.awaitTermination(600, java.util.concurrent.TimeUnit.SECONDS)
      (System.nanoTime() - t0) / 1e9
    }
    // warm both shapes to JIT steady state
    runPool(n); runPool(4 * n); runPool(n); runPool(4 * n)
    val pairs = (1 to reps).map { i =>
      val a = runPool(n); val b = runPool(4 * n)
      println(f"[kernel rep $i] t_n=$a%.2f t_4n=$b%.2f")
      (a, b)
    }
    def stats(xs: Seq[Double]) = (xs.min, xs.sorted.apply(xs.length / 2))
    val (minN, medN) = stats(pairs.map(_._1))
    val (min4, med4) = stats(pairs.map(_._2))
    println(f"[kernel] solves=${seqs.length} min: t_n=$minN%.2f t_4n=$min4%.2f eff=${minN / min4 / 4}%.3f")
    println(f"[kernel] med: t_n=$medN%.2f t_4n=$med4%.2f eff=${medN / med4 / 4}%.3f")
  }
}
