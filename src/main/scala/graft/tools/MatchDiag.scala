package graft.tools

/** Where does the viterbi phase's executor task time go as parallelism
  * grows? Runs the full pipeline at local[8] then local[32] (shared JVM:
  * every kernel adder is readable) and prints the kernel sub-phase split —
  * params (line-surcharge builds), trie (Dijkstra relaxation), mat
  * (geometry materialization) — plus Dijkstra iterations and HopCache
  * hit/miss. A sub-phase whose CPU grows with core count names the
  * scaling culprit; flat CPU with growing wall means contention/GC. */
object MatchDiag {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "96").toInt
    val cols = sys.env.getOrElse("SPARK_GRAFT_COLS", "192").toInt
    val tpr = sys.env.getOrElse("SPARK_GRAFT_TPR", "3600").toInt
    for (par <- Seq(8, 32)) {
      val spark = ScalingBench.session(par)
      try {
        graft.Bench.runPipeline(spark, 8, 12, 2) // JIT warm (small)
        spark.catalog.clearCache()
        graft.router.HopCache.clear()
        System.gc()
        val k0 = graft.router.MatcherKernel.KernelNanos.sum()
        val kc0 = graft.router.MatcherKernel.KernelCpuNanos.sum()
        val p0 = graft.router.MatcherKernel.ParamsNanos.sum()
        val t0 = graft.router.MatcherKernel.TrieNanos.sum()
        val m0 = graft.router.MatcherKernel.MatNanos.sum()
        val i0 = graft.router.Dijkstra.Iters.sum()
        val h0 = graft.router.HopCache.Hits.sum()
        val s0 = graft.router.HopCache.Misses.sum()
        val st = graft.Bench.runPipeline(spark, rows, cols, tpr)
        val vit = st.phases.toMap.apply("viterbi_match")
        println(f"[matchdiag par=$par] viterbi_wall=$vit%.2f " +
          f"kernel_wall=${(graft.router.MatcherKernel.KernelNanos.sum() - k0) / 1e9}%.1f " +
          f"kernel_cpu=${(graft.router.MatcherKernel.KernelCpuNanos.sum() - kc0) / 1e9}%.1f " +
          f"params=${(graft.router.MatcherKernel.ParamsNanos.sum() - p0) / 1e9}%.1f " +
          f"trie=${(graft.router.MatcherKernel.TrieNanos.sum() - t0) / 1e9}%.1f " +
          f"mat=${(graft.router.MatcherKernel.MatNanos.sum() - m0) / 1e9}%.1f " +
          f"dijkstra_iters=${graft.router.Dijkstra.Iters.sum() - i0} " +
          f"hc_hits=${graft.router.HopCache.Hits.sum() - h0} " +
          f"hc_miss=${graft.router.HopCache.Misses.sum() - s0}")
      } finally spark.stop()
    }
  }
}
