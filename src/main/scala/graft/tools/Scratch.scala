package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch driver for manual end-to-end verification (kept out of tests). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GeoFunctions.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumn("lat", (col("c_custkey") % 170).cast("double") - 85.0)
      .withColumn("lon", (col("c_custkey") % 350).cast("double") - 175.0)
      .withColumn("cell", expr("gcell(lat, lon, 12)"))
      .withColumn("ring", expr("size(kring(cell, 1))"))
    df.select("c_custkey", "lat", "lon", "cell", "ring").show(5, false)
    df.select("cell").explain("formatted")
    spark.stop()
  }
}
