package graft.router

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Component-level partitioning of the road graph — the SURVEY §7.3
  * broadcast-size mitigation. The reference routes inside one in-RAM graph
  * (/root/reference/src/pfaedle/trgraph/Graph.h:24-28) and skips
  * cross-component pairs via the per-node component pointer
  * (/root/reference/src/pfaedle/router/Router.tpp:329-331); at continental
  * scale a single full-graph broadcast is the one structural ceiling left.
  * Here the connected components of the routing graph are packed into
  * BINS, each bin broadcast SEPARATELY, plus one slim (edge id -> bin)
  * index. A solver task resolves only the bins its candidate edges touch:
  * Spark's torrent broadcast fetches blocks lazily on first `.value`
  * access, so an executor that only ever solves trips of one region
  * fetches that region's subgraph — per-executor graph bytes shrink with
  * the component count instead of replicating the continent everywhere.
  *
  * Routing parity: bins keep global ids and global edge-id ORDER (see
  * CompactGraph.subset), so solving a cluster against its resolved bin
  * (or the merged graph of several bins) is bit-identical to solving it
  * against the full graph — components are closed under adjacency and the
  * deterministic (cost, dense-index) tie-break preserves relative order.
  * On a real cluster, additionally sorting solver-group keys by bin would
  * co-locate each bin's tasks on few executors; with lazy torrent fetch
  * this is an optimization, not a correctness requirement.
  */
/** How a bin's CompactGraph reaches a solver task. */
sealed trait BinHandle extends Serializable { def get: CompactGraph }

/** Driver-built bin shipped via torrent broadcast (blocks fetched lazily
  * on first .value). */
final case class BroadcastBin(bc: Broadcast[CompactGraph]) extends BinHandle {
  def get: CompactGraph = bc.value
}

/** Executor-built bin persisted to shared storage (DistGraphBuild): the
  * driver never holds the graph bytes — tasks lazily deserialize the file
  * once per JVM (cached by path). `epoch` is the partition set's cache
  * generation, stamped onto the loaded graph so every bin of one build
  * shares one HopCache generation like the broadcast path does. */
final case class FileBin(path: String, epoch: Long) extends BinHandle {
  def get: CompactGraph = FileBin.load(path, epoch)
}

object FileBin {
  /** per-JVM loaded-bin cache, LRU over MaxCached entries (a long-lived
    * executor serving many builds must not pin dead graphs) */
  private val MaxCached = 64
  private val cache =
    new java.util.LinkedHashMap[String, CompactGraph](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, CompactGraph]): Boolean =
        size() > MaxCached
    }

  /** in-flight loads, per path: concurrent tasks needing the SAME bin
    * share one deserialization; tasks needing DIFFERENT bins (or cache
    * hits) never wait behind it — the LRU lock is held only for map ops,
    * not for IO (the r4 memo-stampede lesson, applied here) */
  private val inflight =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.FutureTask[CompactGraph]]()

  def load(path: String, epoch: Long): CompactGraph = {
    val hit = cache.synchronized(cache.get(path))
    if (hit != null) return hit
    val ft = new java.util.concurrent.FutureTask(
      new java.util.concurrent.Callable[CompactGraph] {
        def call(): CompactGraph = doLoad(path, epoch)
      })
    val prev = inflight.putIfAbsent(path, ft)
    val task = if (prev == null) { ft.run(); ft } else prev
    try {
      val g = task.get()
      cache.synchronized(cache.put(path, g))
      g
    } finally inflight.remove(path, task)
  }

  private def doLoad(path: String, epoch: Long): CompactGraph = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), new org.apache.hadoop.conf.Configuration())
    val in = new java.io.ObjectInputStream(new java.io.BufferedInputStream(
      fs.open(new org.apache.hadoop.fs.Path(path)), 1 << 20))
    try in.readObject().asInstanceOf[CompactGraph].setEpoch(epoch)
    finally in.close()
  }

  def write(path: String, g: CompactGraph): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), new org.apache.hadoop.conf.Configuration())
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "." + java.util.UUID.randomUUID())
    val out = new java.io.ObjectOutputStream(new java.io.BufferedOutputStream(
      fs.create(tmp, true), 1 << 20))
    try out.writeObject(g) finally out.close()
    // atomic-ish publish; a concurrent attempt's rename losing the race is
    // fine — contents are deterministic for a given bin
    if (!fs.rename(tmp, p)) fs.delete(tmp, false)
    fs.getFileStatus(p).getLen
  }
}

final class GraphPartitions(
    val bins: Array[BinHandle],
    /** global edge id -> bin index; empty when bins.length == 1 or when
      * candidates carry bin tags (file mode) */
    val binOfEdge: Broadcast[java.util.HashMap[Long, java.lang.Integer]],
    /** file mode: bins were built executor-side; candidate rows MUST carry
      * their bin tag (resolve-by-edge-id has no map to consult) */
    val fileMode: Boolean = false)
  extends Serializable {

  /** optional measurement hook: when set (LocalityProbe), every bin a
    * solver task touches is recorded as (executorId, binIdx) — the
    * fetched-bins-per-executor evidence for the bin-block placement */
  var touchAcc: org.apache.spark.util.CollectionAccumulator[(String, Int)] = null

  private def touched(binIdx: Int): Unit =
    if (touchAcc != null) {
      val env = org.apache.spark.SparkEnv.get
      touchAcc.add(((if (env == null) "driver" else env.executorId), binIdx))
    }

  /** The graph a cluster with these candidate edges must route over: the
    * single touched bin in the common case, a memoized merge when the
    * candidates span bins (e.g. top-K snaps hitting a disconnected
    * island), bin 0 for the all-null-candidate cluster (any graph works —
    * only the fallback ladder runs). Unknown edge ids are ignored, like
    * expandLayer ignores them. */
  def resolve(candEdgeIds: Array[Long]): CompactGraph = {
    if (bins.length == 1) return bins(0).get
    require(!fileMode, "file-mode partitions resolve by bin tags, not edge ids")
    val bm = binOfEdge.value
    var touched: java.util.TreeSet[Integer] = null
    var only = -1
    var i = 0
    while (i < candEdgeIds.length) {
      val b = bm.get(candEdgeIds(i))
      if (b != null) {
        val bi = b.intValue()
        if (only == -1) only = bi
        else if (bi != only && touched == null) {
          touched = new java.util.TreeSet[Integer]()
          touched.add(only); touched.add(bi)
        } else if (touched != null) touched.add(bi)
      }
      i += 1
    }
    if (touched == null) return bins(math.max(only, 0)).get
    GraphPartitions.merged(this, touched)
  }

  /** Resolve from candidate-carried bin tags (negative = untagged). */
  def resolveByBinIds(binIds: Array[Int]): CompactGraph = {
    if (bins.length == 1) { touched(0); return bins(0).get }
    var multi: java.util.TreeSet[Integer] = null
    var only = -1
    var i = 0
    while (i < binIds.length) {
      val bi = binIds(i)
      if (bi >= 0) {
        if (only == -1) only = bi
        else if (bi != only && multi == null) {
          multi = new java.util.TreeSet[Integer]()
          multi.add(only); multi.add(bi)
        } else if (multi != null) multi.add(bi)
      }
      i += 1
    }
    if (multi == null) {
      val b = math.max(only, 0)
      touched(b)
      return bins(b).get
    }
    multi.forEach(b => touched(b.intValue()))
    GraphPartitions.merged(this, multi)
  }
}

object GraphPartitions {
  /** comps smaller than this share a bin with others (one broadcast per
    * 100-edge island would drown the driver in broadcast bookkeeping) */
  val MinBinEdges = 4096
  val MaxBins = 64

  /** Cross-bin merge memo (per executor JVM, generational on the build
    * epoch — HopCache.gen — so merged graphs die with their build instead
    * of pinning whole dead graphs on a long-lived executor): clusters
    * spanning the same bin set share one merged instance — also keeps
    * HopCache ctx (keyed on the graph token) consistent across those
    * clusters. Bounded; over capacity merges run uncached (deterministic,
    * like HopCache). */
  private val MaxMerged = 64
  /** merged-graph resolutions (diagnostics: how often the multi-bin path
    * actually fires — it should be rare on a well-separated world) */
  val MergedResolves = new java.util.concurrent.atomic.LongAdder()

  private[router] def merged(parts: GraphPartitions,
                             touched: java.util.TreeSet[Integer]): CompactGraph = {
    MergedResolves.increment()
    import scala.jdk.CollectionConverters._
    val binIdx = touched.asScala.toArray.map(_.intValue())
    val mergeCache = HopCache.gen(parts.bins(0).get.epoch).merged
    val key = binIdx.map(b => parts.bins(b).get.token).mkString(",")
    val cached = mergeCache.get(key)
    if (cached != null) return cached
    val g = CompactGraph.concat(binIdx.toSeq.map(b => parts.bins(b).get))
    if (mergeCache.size < MaxMerged) mergeCache.putIfAbsent(key, g)
    val again = mergeCache.get(key)
    if (again != null) again else g
  }

  /** Trivial single-bin partitioning (reuses the graph instance). */
  def single(spark: SparkSession, graph: CompactGraph): GraphPartitions =
    new GraphPartitions(Array(BroadcastBin(spark.sparkContext.broadcast(graph))),
      spark.sparkContext.broadcast(new java.util.HashMap[Long, java.lang.Integer]()))

  /** File-backed partitioning over executor-built bins (DistGraphBuild):
    * the driver holds only paths. Candidates must carry bin tags. */
  def fromFiles(spark: SparkSession, binPaths: Seq[String],
                epoch: Long): GraphPartitions =
    new GraphPartitions(binPaths.map(p => FileBin(p, epoch): BinHandle).toArray,
      spark.sparkContext.broadcast(new java.util.HashMap[Long, java.lang.Integer]()),
      fileMode = true)

  /** Pack components into bins and broadcast each. Deterministic: comps
    * ordered by (size desc, label), big comps own a bin, small ones fill
    * the currently-smallest bin; bin count capped. Falls back to a single
    * bin when the graph is one component (a metro street grid) or too
    * small for partitioning to pay. */
  def build(spark: SparkSession, graph: CompactGraph,
            minBinEdges: Int = MinBinEdges, maxBins: Int = MaxBins): GraphPartitions = {
    // comp -> edge count
    val sizes = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < graph.numEdges) {
      val c = graph.compOfEdge(i)
      sizes.put(c, sizes.getOrDefault(c, 0) + 1)
      i += 1
    }
    if (sizes.size <= 1 || graph.numEdges < 2 * minBinEdges)
      return single(spark, graph)

    import scala.jdk.CollectionConverters._
    val comps = sizes.entrySet().asScala.toArray
      .map(e => (e.getKey.intValue(), e.getValue.intValue()))
      .sortBy { case (label, n) => (-n, label) }
    // greedy: big comps own a bin; the rest goes to the smallest bin
    val binComps = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Int]]()
    val binSize = scala.collection.mutable.ArrayBuffer[Long]()
    comps.foreach { case (label, n) =>
      if (binComps.length < maxBins && (n >= minBinEdges || binComps.isEmpty)) {
        binComps += scala.collection.mutable.ArrayBuffer(label)
        binSize += n.toLong
      } else {
        val b = binSize.indices.minBy(binSize(_))
        binComps(b) += label
        binSize(b) += n
      }
    }
    if (binComps.length == 1) return single(spark, graph)

    val binOfComp = new java.util.HashMap[Int, Int]()
    binComps.zipWithIndex.foreach { case (cs, b) => cs.foreach(binOfComp.put(_, b)) }
    val binOfEdgeMap = new java.util.HashMap[Long, java.lang.Integer](graph.numEdges * 2)
    i = 0
    while (i < graph.numEdges) {
      binOfEdgeMap.put(graph.edgeIds(i), binOfComp.get(graph.compOfEdge(i)))
      i += 1
    }
    val bins = binComps.indices.map { b =>
      val cs = binComps(b).toSet
      BroadcastBin(spark.sparkContext.broadcast(
        CompactGraph.subset(graph, i => cs.contains(graph.compOfEdge(i))))): BinHandle
    }.toArray
    new GraphPartitions(bins, spark.sparkContext.broadcast(binOfEdgeMap))
  }
}
