package graft.tools

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence (BASELINE.json north rule): run the
  * identical match+overlay pipeline at local[N] and local[4N] on the same
  * input, report throughput at both plus scaling efficiency
  * (T_N / T_4N) / 4. Writes BENCH/BASELINE.md.
  *
  * Methodology (r1's was rejected as unusable — superlinear kernel number,
  * job number buried in fixed overhead):
  *  - the world is sized so the measured stages run >= 60 s at local[N],
  *    amortizing Spark's fixed stage overhead;
  *  - N and 4N runs are INTERLEAVED (rep 1: N, 4N; rep 2: N, 4N; ...) so
  *    host-level drift (CPU steal bursts) cannot bias one level;
  *  - one full-size warm-up run precedes measurement (same JVM: JIT stays
  *    hot across Spark sessions); caches (Spark + hop memo) are cleared
  *    before every measured run;
  *  - best-of-reps per level (bursty steal makes the minimum the
  *    uncontended measurement);
  *  - an efficiency above 1.05 is reported as a HARNESS FAILURE, not a
  *    result — superlinear scaling from 4x cores is physically implausible.
  */
object ScalingBench {
  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plan strings are structurally bounded now (lineage checkpoints at
      // the diamond choke points cut the r2-era 45M-char expansions to
      // <~120k); the cap is a backstop against regressions, set above the
      // legitimate maximum so a default run logs zero truncation warnings
      .config("spark.sql.maxPlanStringLength", "262144")
      // tmpfs by default, env-gated with disk fallback + wipe-at-start
      // (see Bench.benchLocalDir)
      .config("spark.local.dir", graft.Bench.benchLocalDir())
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GeoFunctions.register(s)
    s
  }

  def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  /** One measured run's full evidence: per-phase seconds, GC time, solver
    * task(group) count — the per-phase split is what localizes any
    * anti-scaling (r2 reported only the total and the collapse could not be
    * attributed to a stage). */
  case class JobSample(phases: Map[String, Double], trips: Long,
                       gcMs: Long, groups: Long,
                       metrics: Map[String, graft.Bench.PhaseM]) {
    def stage: Double =
      phases("cands_join") + phases("viterbi_match") + phases("tile_overlay")
  }

  /** One measured pipeline run: cold caches, warm JIT. */
  def jobStage(spark: SparkSession, rows: Int, cols: Int, tpr: Int): JobSample = {
    spark.catalog.clearCache()
    graft.router.HopCache.clear()
    System.gc()
    val gc0 = gcMillis()
    val g0 = graft.router.MatcherKernel.KernelGroups.sum()
    val st = graft.Bench.runPipeline(spark, rows, cols, tpr)
    val gcMs = gcMillis() - gc0
    val groups = graft.router.MatcherKernel.KernelGroups.sum() - g0
    val cores = spark.sparkContext.defaultParallelism
    println(st.phases.map { case (k, v) => f"$k=$v%.2f" }
      .mkString(s"[phases cores=$cores] ", " ", "") +
      s" gc_ms=$gcMs groups=$groups")
    // attribution: executor task-time vs wall — a phase whose wall greatly
    // exceeds taskMs/cores is driver/scheduling-bound, not executor-bound
    println(st.phases.map { case (k, wall) =>
      val m = st.metrics.getOrElse(k, graft.Bench.PhaseM(0, 0, 0))
      f"$k=${m.taskMs / 1000.0}%.1f/${m.gcMs / 1000.0}%.1f/${m.nTasks}"
    }.mkString(s"[taskSec/gcSec/nTasks cores=$cores] ", " ", ""))
    JobSample(st.phases.toMap, st.rows, gcMs, groups, st.metrics)
  }

  /** Kernel-only scaling: the same distinct-sequence solves through fixed
    * thread pools at n and 4n threads, interleaved, cold hop memo each run.
    * Also reports per-solve CPU time at each level — if those differ the
    * measurement is a JIT/memo artifact, not scaling. */
  def kernelScaling(n: Int, reps: Int): (Double, Double, Int, Double, Double) = {
    val spark = session(8)
    val (graph, candMap, seqs) = try {
      import spark.implicits._
      val cfg = graft.osm.OsmConfig.bus
      val world = graft.fixtures.SyntheticWorld.build(48, 96,
        tripsPerRoute = 900, variedTrips = true)
      val t = graft.fixtures.WorldTables(spark, world)
      val bbox = graft.osm.GraphBuilder.feedBBox(t.stops).pad(cfg.bboxPaddingM)
      val gt0 = graft.osm.GraphBuilder.build(spark, t.osmNodes, t.osmWays, t.osmRels, bbox, cfg)
      gt0.edges.cache()
      val gt = graft.osm.StationSnap.refine(spark, gt0, cfg, gt0.blockers)._1
      val graph = graft.router.CompactGraph.fromEdges(gt.edges, gt.restrictions,
        gt.wayLines, gt.transitLines, gt.turnCycles)
      val cands = graft.router.Matcher.buildCandsWithStations(
        spark, t.stops, gt.edges, gt.stations, cfg)
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

    /** returns (wallSec, solveCpuSec) */
    def runPool(par: Int): (Double, Double) = {
      graft.router.HopCache.clear()
      val cpu0 = graft.router.MatcherKernel.KernelNanos.sum()
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      seqs.foreach { case (k, ln, st) =>
        pool.submit(new Runnable { def run(): Unit = {
          graft.router.MatcherKernel.solveOne(k, ln, st.toArray, graph, candMap, cfg); () } })
      }
      pool.shutdown()
      pool.awaitTermination(1200, java.util.concurrent.TimeUnit.SECONDS)
      ((System.nanoTime() - t0) / 1e9,
        (graft.router.MatcherKernel.KernelNanos.sum() - cpu0) / 1e9)
    }
    // JIT warm at both thread shapes
    runPool(n); runPool(4 * n)
    val pairs = (1 to reps).map { i =>
      val (an, acn) = runPool(n)
      val (a4, ac4) = runPool(4 * n)
      println(f"[kernel rep $i] t_n=$an%.2f (cpu $acn%.1f) t_4n=$a4%.2f (cpu $ac4%.1f)")
      (an, a4, acn, ac4)
    }
    (pairs.map(_._1).min, pairs.map(_._2).min, seqs.length,
      pairs.map(_._3).min, pairs.map(_._4).min)
  }

  def validity(eff: Double): String =
    if (eff > 1.05) "HARNESS FAILURE: superlinear (> 1.05) — measurement artifact"
    else if (eff >= 0.8) "meets target (>= 0.8)"
    else "below target (< 0.8)"

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "64").toInt
    val cols = sys.env.getOrElse("SPARK_GRAFT_COLS", "128").toInt
    val tpr = sys.env.getOrElse("SPARK_GRAFT_TPR", "400").toInt

    // ---- job level: interleaved sessions, same JVM (JIT stays warm) ----
    val samples = scala.collection.mutable.Map(n -> Vector.empty[JobSample],
      4 * n -> Vector.empty[JobSample])
    var trips = 0L
    var warmed = false
    for (rep <- 1 to reps; par <- Seq(n, 4 * n)) {
      val spark = session(par)
      try {
        graft.Bench.runPipeline(spark, 8, 12, 2) // small warm at this shape
        if (!warmed) { jobStage(spark, rows, cols, tpr); warmed = true } // JIT steady state
        val s = jobStage(spark, rows, cols, tpr)
        trips = s.trips
        samples(par) :+= s
        println(f"[job rep $rep] local[$par] stage=${s.stage}%.2f s")
      } finally spark.stop()
    }
    // per-phase minima at each level: this host shows intermittent
    // multi-10-second external stalls (vCPU co-tenancy) that hit ONE
    // random phase of a run; taking the stage total of any single run
    // lets one stalled phase poison the two clean ones. The per-phase
    // minimum over interleaved reps is the uncontended measurement of
    // each phase — the stage figure is their sum.
    val phaseNames = Seq("graph_build", "station_snap", "graph_collect",
      "cands_join", "viterbi_match", "tile_overlay", "tile_verify")
    def phaseMin(par: Int, ph: String): Double = samples(par).map(_.phases(ph)).min
    def stageOf(par: Int): Double =
      phaseMin(par, "cands_join") + phaseMin(par, "viterbi_match") +
        phaseMin(par, "tile_overlay")
    val bestN = samples(n).minBy(_.stage); val best4N = samples(4 * n).minBy(_.stage)
    val tN = stageOf(n); val t4N = stageOf(4 * n)
    val thrN = trips / tN; val thr4N = trips / t4N
    val eff = (tN / t4N) / 4.0
    val phaseTable = phaseNames.map { ph =>
      val a = phaseMin(n, ph); val b = phaseMin(4 * n, ph)
      val mA = bestN.metrics.getOrElse(ph, graft.Bench.PhaseM(0, 0, 0))
      val mB = best4N.metrics.getOrElse(ph, graft.Bench.PhaseM(0, 0, 0))
      f"| $ph | $a%.2f | $b%.2f | ${(a / b) / 4.0}%.2f " +
        f"| ${mA.taskMs / 1000.0}%.1f / ${mA.gcMs / 1000.0}%.1f / ${mA.nTasks} " +
        f"| ${mB.taskMs / 1000.0}%.1f / ${mB.gcMs / 1000.0}%.1f / ${mB.nTasks} |"
    }.mkString("\n")
    val gcLine = f"GC ms (best-stage rep): local[$n]=${bestN.gcMs}, " +
      f"local[${4 * n}]=${best4N.gcMs}; solver groups(tasks): " +
      f"${bestN.groups} (vs ${4 * n} cores at the 4N level)"

    // ---- kernel level (in-process, no Spark scheduling) ----
    val (kN, k4N, nSolves, cpuN, cpu4N) = kernelScaling(n, reps)
    val kEff = (kN / k4N) / 4.0
    val cpuRatio = if (cpuN > 0) cpu4N / cpuN else Double.NaN

    val md =
      s"""# BENCH/BASELINE — two-parallelism scaling evidence
         |
         |North rule: identical job at N and 4N parallelism on the SAME input;
         |sandbox proxy for executors = local[$n] vs local[${4 * n}] cores.
         |Methodology: interleaved N/4N reps (steal bursts cannot bias one
         |level), one full-size JIT warm-up before measurement, caches cold
         |per run, per-PHASE best-of-$reps per level (the host's intermittent
         |multi-10 s external stalls hit one random phase of a run; phase
         |minima over interleaved reps are the uncontended measurements and
         |the stage figure is their sum). Shuffle/checkpoint blocks live on
         |tmpfs: the sandbox has one shared virtual disk, while a real
         |N-executor cluster brings N local disks whose aggregate bandwidth
         |scales with the executors being measured. Efficiency > 1.05 is
         |reported as a harness failure, never as a result.
         |
         |## Full job (station-aware candidate join + Viterbi match + tile overlay)
         |
         || parallelism | stage time (s) | throughput (trips/s) |
         ||---|---|---|
         || local[$n] | ${f"$tN%.2f"} | ${f"$thrN%.1f"} |
         || local[${4 * n}] | ${f"$t4N%.2f"} | ${f"$thr4N%.1f"} |
         |
         |**Job-level scaling efficiency (T_N / T_4N) / 4 = ${f"$eff%.3f"}**
         |— ${validity(eff)}
         |
         |Per-phase split (best rep per level; measured stage = cands_join +
         |viterbi_match + tile_overlay). task/gc/n = summed executor task
         |seconds / executor GC seconds / task count (from the Spark
         |listener of the best rep) — wall >> task/cores means the phase is
         |driver- or scheduling-bound:
         |
         || phase | local[$n] (s) | local[${4 * n}] (s) | efficiency | N: task/gc/n | 4N: task/gc/n |
         ||---|---|---|---|---|---|
         |$phaseTable
         |
         |$gcLine
         |
         |## Matching kernel (in-process thread pools, no Spark scheduling)
         |
         || threads | wall (s) | solves/s | solve CPU (s) |
         ||---|---|---|---|
         || $n | ${f"$kN%.2f"} | ${f"${nSolves / kN}%.1f"} | ${f"$cpuN%.1f"} |
         || ${4 * n} | ${f"$k4N%.2f"} | ${f"${nSolves / k4N}%.1f"} | ${f"$cpu4N%.1f"} |
         |
         |**Kernel scaling efficiency (T_N / T_4N) / 4 = ${f"$kEff%.3f"}**
         |— ${validity(kEff)}. Per-solve CPU ratio 4N/N = ${f"$cpuRatio%.2f"}
         |(a ratio far from 1.0 would mean the wall-clock diff is a JIT/memo
         |artifact, not scaling).
         |
         |Input: deterministic synthetic world rows=$rows cols=$cols
         |tripsPerRoute=$tpr ($trips matched trips; kernel stage: $nSolves
         |distinct sequence solves on the 48x96/tpr=900 world), seed 42.
         |""".stripMargin
    val dir = java.nio.file.Paths.get("BENCH")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("BASELINE.md"), md)
    println(md)
    val valid = eff <= 1.05 && kEff <= 1.05
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","valid":$valid,"t_n":$tN%.2f,"t_4n":$t4N%.2f,"kernel_eff":$kEff%.3f,"kernel_t_n":$kN%.2f,"kernel_t_4n":$k4N%.2f,"kernel_cpu_ratio":$cpuRatio%.2f,"n":$n,"trips":$trips}""")
  }
}
