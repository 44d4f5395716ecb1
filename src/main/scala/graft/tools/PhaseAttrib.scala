package graft.tools

/** One instrumented pipeline run with per-stage task-time attribution
  * (SPARK_GRAFT_STAGE_ATTRIB) — the drill-down companion to ScalingBench:
  * run at two core counts, diff the [stage-attrib] tables, and the
  * anti-scaling stage names itself. */
object PhaseAttrib {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CORES", "8").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "64").toInt
    val cols = sys.env.getOrElse("SPARK_GRAFT_COLS", "128").toInt
    val tpr = sys.env.getOrElse("SPARK_GRAFT_TPR", "400").toInt
    val spark = ScalingBench.session(cores)
    // full-size warm (same discipline as graft.Bench: a toy warm-up leaves
    // C2 still compiling through the measured rep)
    graft.Bench.runPipeline(spark, rows, cols, tpr)
    spark.catalog.clearCache()
    graft.router.HopCache.clear()
    graft.Bench.runPipeline(spark, rows, cols, tpr)
    spark.catalog.clearCache()
    graft.router.HopCache.clear()
    // reset the kernel/Dijkstra adders so the [kernel] line covers exactly
    // the measured rep (same discipline as Bench.main and ScalingBench —
    // full-size warm-ups would otherwise triple every printed counter and
    // break comparability with their per-rep numbers)
    graft.router.Dijkstra.Iters.reset()
    graft.router.MatcherKernel.KernelSolves.reset()
    graft.router.MatcherKernel.KernelNanos.reset()
    graft.router.MatcherKernel.KernelCpuNanos.reset()
    graft.router.MatcherKernel.KernelGroups.reset()
    graft.router.MatcherKernel.ParamsNanos.reset()
    graft.router.MatcherKernel.TrieNanos.reset()
    graft.router.MatcherKernel.MatNanos.reset()
    ScalingBench.onExecutors(spark)(() => { graft.router.HopCache.clear(); 0 })
    val steal0 = graft.Bench.StealMeter.sample()
    val st = graft.Bench.runPipeline(spark, rows, cols, tpr)
    val stealPct = graft.Bench.StealMeter.pct(steal0, graft.Bench.StealMeter.sample())
    println(st.phases.map { case (k, v) => f"$k=$v%.2f" }
      .mkString(s"[phases cores=$cores] ", " ", "") + f" steal_pct=$stealPct%.1f")
    st.metrics.toSeq.sortBy(_._1).foreach { case (k, m) =>
      println(f"[attrib] $k: task=${m.taskMs / 1000.0}%.1f s gc=${m.gcMs / 1000.0}%.1f s " +
        f"fetchWait=${m.fetchMs / 1000.0}%.1f s shufWrite=${m.shufWriteMs / 1000.0}%.1f s " +
        f"resultSer=${m.serMs / 1000.0}%.1f s taskDeser=${m.deserMs / 1000.0}%.1f s " +
        f"n=${m.nTasks} maxTask=${m.maxTaskMs / 1000.0}%.1f s")
    }
    println(f"[kernel] wall=${graft.router.MatcherKernel.KernelNanos.sum() / 1e9}%.1f s " +
      f"cpu=${graft.router.MatcherKernel.KernelCpuNanos.sum() / 1e9}%.1f s " +
      f"params=${graft.router.MatcherKernel.ParamsNanos.sum() / 1e9}%.1f s " +
      f"trie=${graft.router.MatcherKernel.TrieNanos.sum() / 1e9}%.1f s " +
      f"mat=${graft.router.MatcherKernel.MatNanos.sum() / 1e9}%.1f s " +
      s"solves=${graft.router.MatcherKernel.KernelSolves.sum()} " +
      s"groups=${graft.router.MatcherKernel.KernelGroups.sum()} " +
      s"iters=${graft.router.Dijkstra.Iters.sum()} " +
      s"hc_hits=${graft.router.HopCache.Hits.sum()} " +
      s"hc_miss=${graft.router.HopCache.Misses.sum()} " +
      s"hc_size=${graft.router.HopCache.size()}")
    spark.stop()
  }
}
