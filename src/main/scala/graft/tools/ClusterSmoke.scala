package graft.tools

import org.apache.spark.sql.SparkSession

/** Full-pipeline smoke on local-cluster[] (multi-JVM executors): verifies
  * every broadcast/closure in the match pipeline actually serializes and
  * the kernel runs inside separate executor JVMs — local[N] never
  * exercises serialization, so this is the cluster-readiness gate. */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,4096]")
      .appName("graft-cluster-smoke")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GeoFunctions.register(spark)
    val t0 = System.nanoTime()
    val st = graft.Bench.runPipeline(spark, rows = 24, cols = 40, tripsPerRoute = 40)
    println(f"[cluster-smoke] trips=${st.rows} tiles=${st.tiles} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      st.phases.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    spark.stop()
  }
}
