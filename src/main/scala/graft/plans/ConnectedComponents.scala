package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components (A5) by alternating min-label
  * propagation with pointer jumping (large-star/small-star style): labels
  * converge in O(log n) rounds instead of O(diameter). The matcher uses the
  * driver-side union-find on the collected broadcast graph; this operator
  * is the scale path for graphs too large to collect. */
object ConnectedComponents {

  /** edges(a, b) undirected -> (node, comp) with comp = min reachable id. */
  def run(edges: DataFrame, maxRounds: Int = 16): DataFrame = {
    import edges.sparkSession.implicits._
    val sym = edges.select($"a", $"b")
      .unionByName(edges.select($"b".as("a"), $"a".as("b")))
      .distinct().cache()
    var labels = sym.select($"a".as("node")).distinct()
      .withColumn("comp", $"node").cache()
    var round = 0
    var changed = 1L
    while (round < maxRounds && changed > 0) {
      // propagate: comp via neighbors
      val viaNeighbors = sym.join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .select($"a".as("node"), $"comp")
      val step1 = labels.unionByName(viaNeighbors)
        .groupBy($"node").agg(min($"comp").as("comp"))
        .localCheckpoint(true) // cut lineage; also avoids self-join ambiguity
      // pointer jumping: comp -> comp(comp)
      val right = step1.select($"node".as("jnode"), $"comp".as("comp2"))
      val jumped = step1
        .join(right, step1("comp") === right("jnode"), "left_outer")
        .select(step1("node"), coalesce(least(step1("comp"), right("comp2")),
          step1("comp")).as("comp"))
      val newLabels = jumped.localCheckpoint(true)
      changed = newLabels.as("n").join(labels.as("o"), Seq("node"))
        .filter(col("n.comp") =!= col("o.comp")).count()
      labels.unpersist()
      labels = newLabels
      round += 1
    }
    labels
  }
}
