package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (array<float>): brute-force cosine top-k as the exactness baseline, and
  * an LSH-bucketed variant (signed random-projection analog with
  * deterministic integer hyperplanes) as the scale path.
  *
  * Scale notes: brute-force is a broadcast of the (small) query set against
  * the corpus — one pass, no shuffle of the corpus; LSH buckets shrink the
  * candidate set so the pairwise work is per-bucket (the 10^12-row path).
  * Dot products run as codegen'd aggregate expressions (zip via posexplode
  * + sum), no UDFs. */
object AnnOps {

  /** Cosine similarity columns between exploded vector components. */
  private def components(df: DataFrame, id: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(id), posexplode(col("embedding")).as(Seq("i", "v")))
      .withColumn("v", $"v".cast("double"))
  }

  /** Brute-force top-k by cosine: queries (vec_id, embedding) x corpus.
    * Returns (q, neighbor, rank, cos) with deterministic tie-breaks. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import queries.sparkSession.implicits._
    val qc = components(queries, "vec_id").withColumnRenamed("vec_id", "q")
    val cc = components(corpus, "vec_id")
    val qn = qc.groupBy($"q").agg(sqrt(sum($"v" * $"v")).as("qn"))
    val cn = cc.groupBy($"vec_id").agg(sqrt(sum($"v" * $"v")).as("cn"))
    val dots = broadcast(qc).join(cc, Seq("i"))
      .filter($"q" =!= $"vec_id")
      .groupBy($"q", $"vec_id")
      .agg(sum(qc("v") * cc("v")).as("dot"))
    val w = Window.partitionBy($"q").orderBy($"cos".desc, $"vec_id")
    dots.join(broadcast(qn), "q").join(cn, "vec_id")
      .withColumn("cos", round($"dot" / ($"qn" * $"cn"), 4))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"q", $"vec_id".as("neighbor"), $"rank", $"cos")
  }

  /** Deterministic integer hyperplane weight for (plane j, dim i):
    * ((i*37 + j*101) mod 7) - 3  — identical arithmetic in the SQL oracle
    * (no transcendental functions, no RNG). */
  def planeWeight(i: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
    (i * 37 + j * 101) % 7 - 3

  /** LSH bucket id per vector: nPlanes sign bits of deterministic integer
    * hyperplane projections. */
  def lshBuckets(vectors: DataFrame, nPlanes: Int): DataFrame = {
    import vectors.sparkSession.implicits._
    val comp = components(vectors, "vec_id")
    val planes = vectors.sparkSession.range(0, nPlanes).select($"id".cast("int").as("j"))
    comp.crossJoin(broadcast(planes))
      .groupBy($"vec_id", $"j")
      .agg(sum($"v" * planeWeight($"i", $"j")).as("proj"))
      .groupBy($"vec_id")
      .agg(sum(when($"proj" > 0,
        pow(lit(2.0), $"j").cast("long")).otherwise(0L)).as("bucket"))
  }

  /** LSH-bucketed ANN: candidates = same bucket; exact cosine within bucket,
    * top-k per query. Recall < 1 by construction; the bucket histogram is
    * the verifiable output. */
  def lshTopK(vectors: DataFrame, nPlanes: Int, k: Int): DataFrame = {
    import vectors.sparkSession.implicits._
    val b = lshBuckets(vectors, nPlanes)
    val withB = components(vectors, "vec_id").join(b, "vec_id")
    val dots = withB.as("x").join(withB.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.i") === col("y.i") &&
        col("x.vec_id") =!= col("y.vec_id"))
      .groupBy(col("x.vec_id").as("q"), col("y.vec_id").as("neighbor"))
      .agg(sum(col("x.v") * col("y.v")).as("dot"))
    val norms = components(vectors, "vec_id").groupBy($"vec_id")
      .agg(sqrt(sum($"v" * $"v")).as("nrm"))
    val w = Window.partitionBy($"q").orderBy($"cos".desc, $"neighbor")
    dots
      .join(norms.withColumnRenamed("vec_id", "q").withColumnRenamed("nrm", "qn"), "q")
      .join(norms.withColumnRenamed("vec_id", "neighbor").withColumnRenamed("nrm", "nn"), "neighbor")
      .withColumn("cos", round($"dot" / ($"qn" * $"nn"), 4))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"q", $"neighbor", $"rank", $"cos")
  }
}
