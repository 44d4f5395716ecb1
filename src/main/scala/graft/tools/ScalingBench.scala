package graft.tools

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence (BASELINE.json north rule): run the
  * identical match+overlay pipeline at local[N] and local[4N] on the same
  * input, report throughput at both plus scaling efficiency
  * (T_N / T_4N) / 4. Writes BENCH/BASELINE.md. */
object ScalingBench {
  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GeoFunctions.register(s)
    s
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val rows = 48; val cols = 96; val tpr = 900

    def run(cores: Int): (Double, Long) = {
      val spark = session(cores)
      try {
        // warm-up: one FULL-size run so JIT reaches steady state for the
        // kernel at this thread count (cold-JIT runs measured 10x slower)
        graft.Bench.runPipeline(spark, 8, 12, 2)
        spark.catalog.clearCache()
        graft.Bench.runPipeline(spark, rows, cols, tpr)
        val runs = (1 to reps).map { _ =>
          // each rep must redo the work: the CacheManager would otherwise
          // serve rep 2+ from rep 1's cache and we'd measure pure overhead;
          // same for the hop memo (both levels must start cold)
          spark.catalog.clearCache()
          graft.router.HopCache.clear()
          System.gc()
          val st = graft.Bench.runPipeline(spark, rows, cols, tpr)
          println(s"[phases cores=$cores] " + st.phases.map { case (k, v) =>
            f"$k=$v%.2f" }.mkString(" "))
          (st.phases.toMap, st.rows)
        }
        // per-phase medians: a GC pause landing in one phase of one rep
        // must not dominate the stage sum
        def med(k: String): Double = runs.map(_._1(k)).sorted.apply(reps / 2)
        (med("cands_join") + med("viterbi_match") + med("tile_overlay"), runs.head._2)
      } finally spark.stop()
    }

    val (tN, trips) = run(n)
    val (t4N, _) = run(4 * n)
    val thrN = trips / tN; val thr4N = trips / t4N
    val eff = (tN / t4N) / 4.0

    val md =
      s"""# BENCH/BASELINE — two-parallelism scaling evidence
         |
         |North rule: identical job at N and 4N parallelism on the SAME input;
         |sandbox proxy for executors = local[$n] vs local[${4 * n}] cores
         |(BASELINE.md). Stage measured: candidate join + Viterbi match +
         |tile overlay (the matcher+overlay stages). Median of $reps runs.
         |
         || parallelism | stage time (s) | throughput (trips/s) |
         ||---|---|---|
         || local[$n] | ${f"$tN%.2f"} | ${f"$thrN%.1f"} |
         || local[${4 * n}] | ${f"$t4N%.2f"} | ${f"$thr4N%.1f"} |
         |
         |**Scaling efficiency (T_N / T_4N) / 4 = ${f"$eff%.3f"}** (target >= 0.8)
         |
         |Input: deterministic synthetic world rows=$rows cols=$cols
         |tripsPerRoute=$tpr (${trips} matched trips), seed 42.
         |""".stripMargin
    val dir = java.nio.file.Paths.get("BENCH")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("BASELINE.md"), md)
    println(md)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","t_n":$tN%.2f,"t_4n":$t4N%.2f,"n":$n}""")
  }
}
