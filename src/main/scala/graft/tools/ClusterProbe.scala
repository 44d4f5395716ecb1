package graft.tools

import org.apache.spark.sql.SparkSession

/** Viability probe for local-cluster[] mode (multi-JVM executors on one
  * box — the faithful "two cluster sizes" proxy: per-executor heaps, GC,
  * and shuffle like a real cluster, unlike local[N]'s one shared heap). */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,4096]")
      .appName("graft-cluster-probe")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = spark.range(0, 1000000, 1, 8).toDF("id")
      .selectExpr("id % 97 as k", "id")
    val n = df.groupBy($"k").count().count()
    println(s"[cluster-probe] groups=$n executors=" +
      spark.sparkContext.getExecutorMemoryStatus.size)
    // exercise OUR code on executors (classpath check): geo kernel + udf
    graft.functions.GeoFunctions.register(spark)
    val s = spark.range(0, 1000, 1, 4).toDF("id")
      .selectExpr("gcell(cast(id as double)/100.0, cast(id as double)/100.0, 14) as c")
      .agg(org.apache.spark.sql.functions.countDistinct($"c")).head().getLong(0)
    println(s"[cluster-probe] gcells=$s")
    spark.stop()
  }
}
