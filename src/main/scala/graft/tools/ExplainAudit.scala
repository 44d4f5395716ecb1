package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: prints formatted physical plans for the load-bearing queries
  * and greps them for the properties we claim (pushed filters, pruned
  * scans, broadcast joins, whole-stage codegen). Run manually; findings
  * recorded in README. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // bound AQE plan-description stringification: with deep lineage,
      // onUpdatePlan -> explainString is quadratic and can dominate the
      // driver (minutes of CPU inside StringConcat at toy data sizes)
      .config("spark.sql.maxPlanStringLength", "1048576").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GeoFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"

    def audit(name: String, wanted: Seq[String]): Unit = {
      val df = graft.queries.GraftQueries.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val missing = wanted.filterNot(plan.contains)
      println(s"=== $name: " + (if (missing.isEmpty) "OK" else s"MISSING ${missing.mkString(", ")}"))
      if (missing.nonEmpty) println(plan.take(4000))
    }

    // pushdown + pruning reach the parquet scan
    // (codegen ids are not annotated pre-execution under AQE; assert the
    // scan-level properties instead)
    audit("q_bbox_filter", Seq("PushedFilters", "ReadSchema: struct<c_custkey:bigint>"))
    // broadcast join picked for the k-ring spatial join
    audit("q_kring_join", Seq("BroadcastHashJoin", "gcell"))
    // pruned read schema on a projection-only query
    audit("q_cell_assign", Seq("ReadSchema: struct<c_custkey:bigint>"))
    // distance join = k-ring cell equi-join (BroadcastHashJoin), NOT a
    // cartesian BroadcastNestedLoopJoin (r1's scale-killer anti-pattern)
    audit("q_dist_join", Seq("BroadcastHashJoin", "kring"))
    // window agg stays codegen'd
    audit("q_running_sum", Seq("Window", "Sort"))
    spark.stop()
  }
}
