package graft.router

import java.util.PriorityQueue

/** Edge-expanded Dijkstra over a CompactGraph — the engine's G1
  * (reference: EDijkstra via /root/reference/src/pfaedle/router/Router.h:26,
  * call shapes /root/reference/src/pfaedle/router/Router.tpp:253-526).
  * States are DIRECTED edges, so turn costs/restrictions between
  * (fromEdge, viaNode, toEdge) are expressible. Deterministic total order
  * (cost, dirEdgeId) for reproducible tie-breaking (SURVEY §7.3).
  *
  * Costs are Long deciseconds (saturating, ceil-rounded at the source —
  * Geo.costToInt), matching the reference's u32 fixed point (4.10).
  */
object Dijkstra {
  /** Global iteration counter analog of EDijkstra::ITERS (read by stats). */
  val Iters = new java.util.concurrent.atomic.AtomicLong(0)

  final case class Result(cost: Array[Long], pred: Array[Int], reached: Int,
                          settled: java.util.BitSet)
  val Inf: Long = Long.MaxValue / 4

  /** 1->N: from source directed edge (cost counted from its START, i.e. the
    * full edge cost is paid) to a set of target directed edges (cost counted
    * to their END). initCost10 is added at the source (progr offsets).
    * Stops when all targets settled or PQ cost exceeds cutoff10.
    * turnPen10(fromDir, toDir): additional transition cost, or -1 to forbid.
    * Returns per-dirEdge settled cost + predecessor dirEdge (-1 = source/unreached). */
  def oneToMany(g: CompactGraph, sourceDir: Int, initCost10: Long,
                targets: java.util.BitSet, cutoff10: Long,
                turnPen10: (Int, Int) => Long): Result = {
    val n = 2 * g.numEdges
    val cost = Array.fill[Long](n)(Inf)
    val pred = Array.fill[Int](n)(-1)
    val settled = new java.util.BitSet(n)
    var remaining = targets.cardinality()
    // PQ ordered by (cost, dirEdge) — deterministic
    // (cost, dirEdge) packed into one Long for an unboxed deterministic PQ:
    // cost clamped to u32 range (the reference's u32 saturating costs, 4.10)
    // in the high 32 bits, dirEdge (< 2^31) in the low 32.
    val pq = new PriorityQueue[Long]()
    @inline def pack(c: Long, de: Int): Long =
      (math.min(c, Int.MaxValue.toLong) << 32) | de.toLong
    @inline def unpackCost(p: Long): Long = p >>> 32
    @inline def unpackDe(p: Long): Int = (p & 0xffffffffL).toInt

    val start = initCost10 + g.dirCost10(sourceDir)
    cost(sourceDir) = start
    pq.add(pack(start, sourceDir))

    var exceeded = false
    while (!pq.isEmpty && remaining > 0 && !exceeded) {
      val top = pq.poll()
      val c = unpackCost(top); val de = unpackDe(top)
      // PQ is monotone: once the frontier passes the cutoff nothing cheaper
      // can ever settle — terminate (reference cutoff semantics,
      // Router.tpp:96-148: paths beyond the cutoff are "not found")
      if (c > cutoff10) exceeded = true
      else if (!settled.get(de) && c <= cost(de)) {
        settled.set(de)
        Iters.incrementAndGet()
        if (targets.get(de)) remaining -= 1
        if (remaining > 0) {
          val toNode = g.dirTo(de)
          val ni = g.nodeIndex.get(toNode)
          if (ni != null) {
            val lo = g.adjOffsets(ni); val hi = g.adjOffsets(ni + 1)
            var k = lo
            while (k < hi) {
              val nx = g.adjEdges(k)
              if (!settled.get(nx)) {
                val tp = turnPen10(de, nx)
                if (tp >= 0) {
                  val nc = c + g.dirCost10(nx) + tp
                  if (nc < cost(nx) || (nc == cost(nx) && de < pred(nx))) {
                    cost(nx) = nc; pred(nx) = de
                    pq.add(pack(nc, nx))
                  }
                }
              }
              k += 1
            }
          }
        }
      }
    }
    Result(cost, pred, targets.cardinality() - remaining, settled)
  }

  /** Materialize the directed-edge path source..target from predecessors. */
  def path(res: Result, sourceDir: Int, targetDir: Int): Array[Int] = {
    if (res.cost(targetDir) >= Inf) return Array.empty
    val buf = scala.collection.mutable.ArrayBuffer[Int]()
    var cur = targetDir
    var guard = 0
    while (cur != -1 && guard < 1000000) {
      buf += cur
      if (cur == sourceDir) { return buf.reverse.toArray }
      cur = res.pred(cur)
      guard += 1
    }
    buf.reverse.toArray
  }
}
