package graft.router

import graft.geo.Geo

/** One snap candidate of a stop onto a directed edge — the reference's
  * EdgeCand (/root/reference/src/pfaedle/router/Misc.h:27-34). progr is the
  * position along the DIRECTED edge in [0,1]; pen10 the emission penalty in
  * deciseconds. dirEdge == -1 is the null placeholder candidate
  * (ShapeBuilder.cpp:171-173) used when a stop has no snap. */
final case class Cand(dirEdge: Int, progr: Double, pen10: Long,
                      pLat: Double, pLon: Double)

/** Result of a layered solve: per hop the directed-edge path and partial
  * progress on first/last edge; cost for stats. */
final case class HopPath(edges: Array[Int], progrStart: Double, progrEnd: Double,
                         reachable: Boolean)
final case class SolveResult(bestCands: Array[Int], hops: Array[HopPath], totalCost10: Long)

/** Layered Viterbi DAG solve over stop layers — the reference's Router
  * (/root/reference/src/pfaedle/router/Router.tpp:23-280): for each adjacent
  * stop layer compute an n x m hop-cost matrix via 1->N edge Dijkstra
  * (Router.tpp:284-430 "hops"), relax cost[to] = min(cost[fr] + pen[to] +
  * transitionWeight), backtrace, re-materialize edge lists. Includes the
  * cost-cutoff doubling retry (<= 3 steps, Router.h:35) and the
  * null-candidate fallback ladder (Router.tpp:150-180).
  */
object Viterbi {
  val MaxDoublingSteps = 3

  /** Transition weight (ExpoTransWeight analog, Weights.cpp:175-215): the
    * path cost itself scaled by transitionPenalty, with a cutoff derived
    * from the scheduled hop time: maxCost10 = max(schedSec, 60) * 3 * 10. */
  def maxHopCost10(schedSec: Double): Long =
    (math.max(schedSec, 60.0) * 3.0 * 10.0).toLong

  /** Solve one trip/cluster.
    * @param cands candidate group per stop layer (each non-empty; may hold
    *              the null candidate)
    * @param schedSec scheduled seconds between consecutive stops (n-1)
    * @param straightDist10 fallback cost for an unroutable hop (from
    *        straight-line distance), per hop
    * @param turnPen10 transition penalty oracle (-1 = forbidden)
    */
  def solve(g: CompactGraph, cands: Array[Array[Cand]], schedSec: Array[Double],
            turnPen10: (Int, Int) => Long,
            hopCache: java.util.HashMap[Long, Long] = new java.util.HashMap()): SolveResult = {
    val nLayers = cands.length
    require(nLayers >= 1 && schedSec.length == nLayers - 1)
    val Inf = Dijkstra.Inf

    // cost/pred lattice (CostsDAG/PredeDAG, Router.h:38-40)
    val cost = Array.tabulate(nLayers)(l => Array.fill[Long](cands(l).length)(Inf))
    val pred = Array.tabulate(nLayers)(l => Array.fill[Int](cands(l).length)(-1))
    // per (layer, from, to): directed-edge path for backtrace materialization
    val hopPaths = new java.util.HashMap[Long, Array[Int]]()
    @inline def hpKey(layer: Int, fr: Int, to: Int): Long =
      (layer.toLong << 40) | (fr.toLong << 20) | to.toLong

    var c0 = 0
    while (c0 < cands(0).length) {
      cost(0)(c0) = cands(0)(c0).pen10
      c0 += 1
    }

    var layer = 0
    while (layer < nLayers - 1) {
      val from = cands(layer); val to = cands(layer + 1)
      val baseCutoff = maxHopCost10(schedSec(layer))
      var fr = 0
      while (fr < from.length) {
        if (cost(layer)(fr) < Inf) {
          val fc = from(fr)
          if (fc.dirEdge >= 0) {
            // targets: real candidate edges of the next layer
            val targets = new java.util.BitSet(2 * g.numEdges)
            var t = 0
            while (t < to.length) {
              if (to(t).dirEdge >= 0) targets.set(to(t).dirEdge)
              t += 1
            }
            if (!targets.isEmpty) {
              // init cost: remaining part of the source edge after progr —
              // Router.tpp progression offset math, in deciseconds.
              // Dijkstra pays the FULL source edge cost, so subtract the
              // consumed part: init = -progr * cost(e). We fold it in by
              // passing initCost10 = -(progr * cost) (>= -cost).
              val srcCost = g.dirCost10(fc.dirEdge)
              val init = -math.min(srcCost, math.round(fc.progr * srcCost))
              // comp shortcut (Router.tpp:329-331): if all targets in other
              // components, skip the search entirely
              val srcComp = g.compOfDir(fc.dirEdge)
              var anySameComp = false
              var ti = targets.nextSetBit(0)
              while (ti >= 0 && !anySameComp) {
                if (g.compOfDir(ti) == srcComp) anySameComp = true
                ti = targets.nextSetBit(ti + 1)
              }
              if (anySameComp) {
                // iterative deepening: cutoff doubling <= 3 steps (4.9)
                var cutoff = baseCutoff
                var step = 0
                var res: Dijkstra.Result = null
                var done = false
                while (!done && step <= MaxDoublingSteps) {
                  res = Dijkstra.oneToMany(g, fc.dirEdge, init, targets, cutoff, turnPen10)
                  done = res.reached > 0 || step == MaxDoublingSteps
                  cutoff *= 2; step += 1
                }
                var t2 = 0
                while (t2 < to.length) {
                  val tc = to(t2)
                  if (tc.dirEdge >= 0 && res.settled.get(tc.dirEdge)) {
                    // subtract un-traversed tail of the target edge
                    val tgtCost = g.dirCost10(tc.dirEdge)
                    var hop = res.cost(tc.dirEdge) -
                      math.min(tgtCost, math.round((1.0 - tc.progr) * tgtCost))
                    // same-edge special case: directly along one edge
                    if (tc.dirEdge == fc.dirEdge) {
                      hop =
                        if (tc.progr >= fc.progr)
                          math.round((tc.progr - fc.progr) * srcCost)
                        else Inf // backwards on a directed edge: not this way
                    }
                    if (hop < Inf) {
                      if (hop < 0) hop = 0
                      val total = cost(layer)(fr) + hop + tc.pen10
                      if (total < cost(layer + 1)(t2)) {
                        cost(layer + 1)(t2) = total
                        pred(layer + 1)(t2) = fr
                        hopPaths.put(hpKey(layer, fr, t2),
                          if (tc.dirEdge == fc.dirEdge && tc.progr >= fc.progr)
                            Array(fc.dirEdge)
                          else Dijkstra.path(res, fc.dirEdge, tc.dirEdge))
                      }
                    }
                  }
                  t2 += 1
                }
              }
            }
          }
          // null-candidate / fallback edge: always allow the straight-line
          // fallback so the DAG never dead-ends (Router.tpp:150-180)
          var t3 = 0
          while (t3 < to.length) {
            val tc = to(t3)
            val fallback = cost(layer)(fr) + tc.pen10 +
              maxHopCost10(schedSec(layer)) * 2 // strictly worse than any real path
            if (fallback < cost(layer + 1)(t3)) {
              cost(layer + 1)(t3) = fallback
              pred(layer + 1)(t3) = fr
              hopPaths.put(hpKey(layer, fr, t3), Array.empty[Int])
            }
            t3 += 1
          }
        }
        fr += 1
      }
      layer += 1
    }

    // sink selection: argmin over last layer (O3), tie -> lowest index
    val last = nLayers - 1
    var best = 0; var bestCost = Inf
    var i = 0
    while (i < cands(last).length) {
      if (cost(last)(i) < bestCost) { bestCost = cost(last)(i); best = i }
      i += 1
    }

    // backtrace
    val chosen = new Array[Int](nLayers)
    chosen(last) = best
    var l = last
    while (l > 0) {
      chosen(l - 1) = pred(l)(chosen(l))
      l -= 1
    }
    val hops = new Array[HopPath](math.max(0, nLayers - 1))
    l = 0
    while (l < nLayers - 1) {
      val fr = chosen(l); val t = chosen(l + 1)
      val p = hopPaths.get(hpKey(l, fr, t))
      val edges = if (p == null) Array.empty[Int] else p
      hops(l) = HopPath(edges,
        if (fr >= 0) cands(l)(fr).progr else 0.0,
        if (t >= 0) cands(l + 1)(t).progr else 0.0,
        reachable = edges.nonEmpty)
      l += 1
    }
    SolveResult(chosen, hops, bestCost)
  }
}
