package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deduplication operators for training-data pipelines — exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine. All formulas are
  * integer/ascii arithmetic reproducible in the DuckDB oracle; the Spark
  * plans are shuffle-lean (gram explode -> groupBy doc -> band equi-join).
  *
  * Scale notes: MinHash/SimHash signatures reduce each document to O(1)
  * state, so the candidate join shuffles signatures, never documents; the
  * pairwise verify joins only LSH-bucket collisions (band equality), the
  * standard way n^2 is avoided at 10^12 rows. */
object DedupOps {
  val MinhashPrime = 2147483647L
  val NumHashes = 8

  /** Exact dedup: canonical representative per identical text.
    * (hash-groupBy; at scale this is a single shuffle on the text hash). */
  def exact(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.groupBy($"text")
      .agg(min($"doc_id").as("canonical_id"), count(lit(1)).cast("long").as("n_dups"))
      .select($"canonical_id", $"n_dups")
  }

  /** Per-doc distinct gram-hash sets (the shingle set). */
  def gramHashes(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    TextOps.wordBigrams(docs, "doc_id", "text")
      .select($"doc_id", TextOps.gramHash($"gram").as("h")).distinct()
  }

  /** n-gram Jaccard similarity for candidate pairs sharing >= 1 gram:
    * |A ∩ B| / |A ∪ B| over word-bigram hash sets. Returns pairs with
    * jaccard >= threshold (a < b). */
  def ngramJaccard(docs: DataFrame, threshold: Double): DataFrame = {
    import docs.sparkSession.implicits._
    val g = gramHashes(docs).cache()
    val sizes = g.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val inter = g.as("x").join(g.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jaccard",
        round($"n_inter".cast("double") / ($"sza" + $"szb" - $"n_inter"), 4))
      .filter($"jaccard" >= threshold)
      .select($"a", $"b", $"jaccard")
  }

  /** MinHash signatures: minhash_j = min((a_j*h + b_j) mod p) for j=1..8,
    * a_j = 2j+1, b_j = j*12345 (all-positive arithmetic: identical mod
    * semantics in every engine). Output: (doc_id, j, mh). */
  def minhash(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val g = gramHashes(docs)
    val js = docs.sparkSession.range(1, NumHashes + 1).select($"id".cast("int").as("j"))
    g.crossJoin(broadcast(js))
      .groupBy($"doc_id", $"j")
      .agg(min((($"j" * 2 + 1) * $"h" + $"j" * 12345) % MinhashPrime).as("mh"))
  }

  /** MinHash LSH candidate pairs: 4 bands x 2 rows; two docs collide when a
    * whole band matches. Returns (a, b, n_bands) pairs, a < b. */
  def minhashLsh(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val mh = minhash(docs)
    // band id = (j+1)/2; band signature = sum of member hashes (order-free)
    val bands = mh.withColumn("band", (($"j" + 1) / 2).cast("int"))
      .groupBy($"doc_id", $"band")
      .agg(sum($"mh").as("sig"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).cast("long").as("n_bands"))
  }

  /** 16-bit SimHash from gram hashes: bit_k set iff sum over grams of
    * (+1 if bit k of h else -1) > 0. Bit test via pure mod arithmetic
    * ((h mod 2^(k+1)) >= 2^k) so the oracle matches exactly. */
  def simhash(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val g = gramHashes(docs)
    val bits = (0 until 16).map { k =>
      val p = 1L << k
      sum(when(($"h" % (2 * p)) >= p, 1).otherwise(-1)).as(s"s$k")
    }
    g.groupBy($"doc_id").agg(bits.head, bits.tail: _*)
      .select($"doc_id",
        (0 until 16).map { k =>
          when(col(s"s$k") > 0, lit(1L << k)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
  }

  /** Embedding near-dup pairs: cosine >= threshold within the same label
    * block, additionally banded to |a-b| <= 100 (deterministic windowed
    * blocking: keeps the pair count linear at any scale; the full-recall
    * path is the LSH variant in AnnOps). */
  def embeddingCosine(emb: DataFrame, threshold: Double): DataFrame = {
    import emb.sparkSession.implicits._
    val e = emb.select($"vec_id", $"label", posexplode($"embedding").as(Seq("i", "v")))
      .withColumn("v", $"v".cast("double"))
    val norms = e.groupBy($"vec_id").agg(sqrt(sum($"v" * $"v")).as("nrm"))
    val dots = e.as("x").join(e.as("y"),
        col("x.label") === col("y.label") && col("x.i") === col("y.i") &&
        col("x.vec_id") < col("y.vec_id") &&
        col("y.vec_id") - col("x.vec_id") <= 100)
      .groupBy(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .agg(sum(col("x.v") * col("y.v")).as("dot"))
    dots
      .join(norms.withColumnRenamed("vec_id", "a").withColumnRenamed("nrm", "na"), "a")
      .join(norms.withColumnRenamed("vec_id", "b").withColumnRenamed("nrm", "nb"), "b")
      .withColumn("cos", round($"dot" / ($"na" * $"nb"), 4))
      .filter($"cos" >= threshold)
      .select($"a", $"b", $"cos")
  }
}
