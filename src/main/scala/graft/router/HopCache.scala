package graft.router

import java.util.concurrent.ConcurrentHashMap

/** Executor-global hop-cost memo — the engine's analog of the reference's
  * HopCache (/root/reference/src/pfaedle/router/HopCache.h:17-34) plus its
  * cross-trie reuse (hop cache scoped per forest,
  * ShapeBuilder.cpp:1189-1193). Keyed by (source directed edge, quantized
  * source progress, cutoff, target set); the value stores the outcome of
  * the full cutoff-doubling search: raw g-cost + path per target directed
  * edge. Distinct stop pairs repeat across thousands of trip patterns, so
  * this collapses the Dijkstra count by orders of magnitude.
  *
  * Bounded: inserts stop at MaxEntries (no eviction — deterministic). */
object HopCache {
  /** ctx identifies the (graph instance, routing config, line identity)
    * the entry was computed under — without it, two CompactGraphs in one
    * JVM (warm-up world + measurement world; bus + rail MOTs) share dense
    * edge indices and get() could return costs from the wrong graph. */
  final case class Key(ctx: Long, fromDir: Int, progrQ: Int, cutoff10: Long, tHash: Long)

  /** 64-bit mix of graph token, config fingerprint and line name (FNV-1a
    * over the name avoids 32-bit String.hashCode collisions). */
  def mixCtx(graphToken: Long, cfgFp: Long, lineName: String): Long =
    mixCtx(graphToken, cfgFp, Seq(lineName))

  /** variant folding the full routing-attrs identity (line short name +
    * from/to strings — G2): two attr sets must never share hop entries. */
  def mixCtx(graphToken: Long, cfgFp: Long, parts: Seq[String]): Long = {
    var h = graphToken * 0x9e3779b97f4a7c15L ^ cfgFp
    parts.foreach { p =>
      h = (h ^ 0x1f) * 0x100000001b3L // part separator
      if (p != null) {
        var i = 0
        while (i < p.length) {
          h = (h ^ p.charAt(i)) * 0x100000001b3L
          i += 1
        }
      }
    }
    h
  }
  /** targets aligned with costs/paths; cost = Dijkstra.Inf if unreached */
  final case class Val(targets: Array[Int], costs: Array[Long], paths: Array[Array[Int]])

  val MaxEntries = 200000

  /** Memoized computation holder. Publication policy (r4): the FIRST
    * toucher computes and publishes; a thread arriving while the value is
    * still in flight computes its own copy locally WITHOUT waiting or
    * publishing. r2 had no memo (every thread re-ran every Dijkstra — 22x
    * per-solve CPU inflation); r3 blocked concurrent requesters on one
    * lazy-val computation, which serialized the cold-start stampede: with
    * pool threads == cores a blocked thread idles its core, and salted
    * sub-groups of one physical cluster (same memo ctx) all want the same
    * layer entries at the same moment — measured as the kernel pool
    * scaling 0.565 from 8->32 threads on a host whose pure-CPU probe
    * scales at 0.94. Duplicating an in-flight compute costs one parallel
    * redundant Dijkstra but never an idle core, and identical inputs give
    * an identical value, so publication order cannot change results. */
  final class Entry(compute: () => Val) {
    @volatile private var v: Val = null
    /** the published value, or null while still in flight */
    def published: Val = v
    /** run the computation on THIS thread and publish it */
    def computeAndPublish(): Val = { val r = compute(); v = r; r }
  }

  private val map = new ConcurrentHashMap[Key, Entry]()
  private val mapCount = new java.util.concurrent.atomic.LongAdder()

  def targetsHash(targets: Array[Int]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < targets.length) { h = 31 * h + targets(i); i += 1 }
    h
  }

  /** Memoized lookup: the creating thread computes and publishes; a thread
    * that finds the entry still in flight computes locally without waiting
    * (see Entry). The compute closure MUST acquire its own thread-local
    * workspace (it may run on whichever thread touches the entry first).
    * Over MaxEntries, computes run uncached (deterministic: no eviction).
    * A 64-bit targets-hash collision also computes uncached. */
  def getOrCompute(key: Key, targets: Array[Int], compute: () => Val): Val = {
    var created = false
    val e =
      if (mapCount.sum() >= MaxEntries) map.get(key)
      else map.computeIfAbsent(key, _ => {
        created = true; mapCount.increment(); new Entry(compute)
      })
    val v =
      if (created) { Misses.increment(); e.computeAndPublish() }
      else if (e == null) { Misses.increment(); compute() } // over capacity
      else {
        val p = e.published
        if (p != null) { Hits.increment(); p }
        else { Misses.increment(); compute() } // in flight: duplicate, don't wait
      }
    if (java.util.Arrays.equals(v.targets, targets)) v
    else compute() // hash collision: compute fresh, don't poison the entry
  }

  // ---- layer-level memo for the hopsFast N->N path ----
  // Keyed on the WHOLE layer: (ctx, source set incl. quantized progr and
  // RELATIVE lattice costs, cutoff, target set). Relative costs make the
  // entry shift-invariant: adding a constant to every source cost changes
  // neither the per-target argmin nor the paths, and identical stop-chains
  // re-appearing in other tries/clusters produce exactly the same relative
  // cost vector.
  final case class LayerKey(ctx: Long, srcsHash: Long, cutoff10: Long, tHash: Long)
  /** srcs: packed verification copy (2 longs per seed: (dirEdge<<32|progrQ),
    * relInit). costsRel = settled cost - minInit per target (Inf if
    * unreached); winners = winning SEED directed edge (-1 unreached). */
  final case class LayerVal(srcs: Array[Long], targets: Array[Int],
                            costsRel: Array[Long], winners: Array[Int],
                            paths: Array[Array[Int]])

  /** same first-toucher-publishes / in-flight-duplicates policy as Entry */
  final class LayerEntry(compute: () => LayerVal) {
    @volatile private var v: LayerVal = null
    def published: LayerVal = v
    def computeAndPublish(): LayerVal = { val r = compute(); v = r; r }
  }
  private val layerMap = new ConcurrentHashMap[LayerKey, LayerEntry]()
  private val layerCount = new java.util.concurrent.atomic.LongAdder()

  def srcsHash(srcs: Array[Long]): Long = {
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < srcs.length) { h = (h ^ srcs(i)) * 0x100000001b3L; i += 1 }
    h
  }

  def layerGetOrCompute(key: LayerKey, srcs: Array[Long], targets: Array[Int],
                        compute: () => LayerVal): LayerVal = {
    var created = false
    val e =
      if (layerCount.sum() >= MaxEntries) layerMap.get(key)
      else layerMap.computeIfAbsent(key, _ => {
        created = true; layerCount.increment(); new LayerEntry(compute)
      })
    val v =
      if (created) { Misses.increment(); e.computeAndPublish() }
      else if (e == null) { Misses.increment(); compute() } // over capacity
      else {
        val p = e.published
        if (p != null) { Hits.increment(); p }
        else { Misses.increment(); compute() } // in flight: duplicate, don't wait
      }
    if (java.util.Arrays.equals(v.srcs, srcs) &&
        java.util.Arrays.equals(v.targets, targets)) v
    else compute() // hash collision: compute fresh, don't poison the entry
  }

  def clear(): Unit = {
    map.clear(); layerMap.clear()
    mapCount.reset(); layerCount.reset()
    MatcherKernel.clearLineExtraCache() // same lifecycle: per-graph memo
    GraphPartitions.clearMergeCache()   // ditto (keyed by graph tokens)
  }
  def size(): Int = map.size() + layerMap.size()
  val Hits = new java.util.concurrent.atomic.LongAdder()
  val Misses = new java.util.concurrent.atomic.LongAdder()
}
