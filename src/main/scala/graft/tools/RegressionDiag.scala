package graft.tools

/** A/B diagnosis of the r4 viterbi_match throughput regression (155 → 96
  * trips/s on the unchanged 24×40 tpr=40 bench world): runs the bench
  * pipeline N times in one JVM at local[32] and prints per-rep Dijkstra
  * iterations split by where the layer relax spent them — fast N→N passes,
  * residual per-source fill-ins, ladder restarts — plus HopCache traffic.
  * Counter deltas name which r4 exactness fix (residual deferral, overflow
  * masks, relative-time cutoffs) buys the extra iterations. */
object RegressionDiag {
  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = ScalingBench.session(32)
    try {
      graft.Bench.runPipeline(spark, 8, 12, 2) // JIT warm (small)
      for (rep <- 1 to reps) {
        spark.catalog.clearCache()
        graft.router.HopCache.clear()
        System.gc()
        val i0 = graft.router.Dijkstra.Iters.sum()
        val h0 = graft.router.HopCache.Hits.sum()
        val s0 = graft.router.HopCache.Misses.sum()
        val rt0 = graft.router.Viterbi.ResidualTargets.sum()
        val rp0 = graft.router.Viterbi.ResidualPasses.sum()
        val lp0 = graft.router.Viterbi.LadderPasses.sum()
        val ly0 = graft.router.Viterbi.LayersRelaxed.sum()
        val st = graft.Bench.runPipeline(spark, 24, 40, 40)
        val vit = st.phases.toMap.apply("viterbi_match")
        println(f"[regdiag rep=$rep] viterbi_wall=$vit%.3f " +
          f"iters=${graft.router.Dijkstra.Iters.sum() - i0} " +
          f"hc_hits=${graft.router.HopCache.Hits.sum() - h0} " +
          f"hc_miss=${graft.router.HopCache.Misses.sum() - s0} " +
          f"layers=${graft.router.Viterbi.LayersRelaxed.sum() - ly0} " +
          f"ladder_passes=${graft.router.Viterbi.LadderPasses.sum() - lp0} " +
          f"residual_passes=${graft.router.Viterbi.ResidualPasses.sum() - rp0} " +
          f"residual_targets=${graft.router.Viterbi.ResidualTargets.sum() - rt0} " +
          f"r_self=${graft.router.Viterbi.ResidualSelf.sum()} " +
          f"r_cut=${graft.router.Viterbi.ResidualCut.sum()} " +
          f"r_clamp=${graft.router.Viterbi.ResidualClamp.sum()}")
      }
    } finally spark.stop()
  }
}
