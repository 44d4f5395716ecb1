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
            vmaxMs: Double = 85.0 / 3.6,
            cacheKeySalt: Long = 0L): SolveResult = {
    val nLayers = cands.length
    require(nLayers >= 1 && schedSec.length == nLayers - 1)
    val Inf = Dijkstra.Inf
    val ws = WorkspacePool.get(2 * g.numEdges)

    // cost/pred lattice (CostsDAG/PredeDAG, Router.h:38-40)
    val cost = Array.tabulate(nLayers)(l => Array.fill[Long](cands(l).length)(Inf))
    val pred = Array.tabulate(nLayers)(l => Array.fill[Int](cands(l).length)(-1))
    // best directed-edge path INTO each (layer, cand) — only the current
    // winner is kept (a keyed map of every (fr,to) path churned ~MBs/solve)
    val bestPath = Array.tabulate(nLayers)(l => new Array[Array[Int]](cands(l).length))

    var c0 = 0
    while (c0 < cands(0).length) {
      cost(0)(c0) = cands(0)(c0).pen10
      c0 += 1
    }

    var layer = 0
    while (layer < nLayers - 1) {
      val from = cands(layer); val to = cands(layer + 1)
      val baseCutoff = maxHopCost10(schedSec(layer))
      // A* heuristic (reference Weights.cpp:15-62): centroid of the target
      // candidates + the max centroid->target distance keeps it admissible
      // AND consistent; h(target) = 0 so cutoff termination stays exact.
      var ctLat = 0.0; var ctLon = 0.0; var nT = 0
      var ti0 = 0
      while (ti0 < to.length) {
        if (to(ti0).dirEdge >= 0) { ctLat += to(ti0).pLat; ctLon += to(ti0).pLon; nT += 1 }
        ti0 += 1
      }
      val heur: Int => Long = if (nT == 0) null else {
        ctLat /= nT; ctLon /= nT
        var maxCentD = 0.0
        // vmax: fastest edge among the TARGET components (reference's
        // per-component maxSpeed, NodePL.h:23-25) — a reachable path stays
        // within the source=target component, so this stays admissible
        var vmax = 1.0
        var ti1 = 0
        while (ti1 < to.length) {
          if (to(ti1).dirEdge >= 0) {
            val d = Geo.approxDistM(ctLat, ctLon, to(ti1).pLat, to(ti1).pLon)
            if (d > maxCentD) maxCentD = d
            val v = g.compMaxSpeed(g.compOfDir(to(ti1).dirEdge))
            if (v > vmax) vmax = v
          }
          ti1 += 1
        }
        val cLat = ctLat; val cLon = ctLon; val mcd = maxCentD
        val vm = math.min(vmax, vmaxMs)
        (de: Int) => {
          val d = Geo.approxDistM(g.dirToLat(de), g.dirToLon(de), cLat, cLon) - mcd
          if (d <= 0) 0L else (d / vm * 10.0).toLong
        }
      }
      // targets: real candidate edges of the next layer (hoisted: shared
      // by every source candidate of this layer)
      val targets = to.collect { case c if c.dirEdge >= 0 => c.dirEdge }
      val tHash = HopCache.targetsHash(targets)
      var fr = 0
      while (fr < from.length) {
        if (cost(layer)(fr) < Inf) {
          val fc = from(fr)
          if (fc.dirEdge >= 0) {
            if (targets.nonEmpty) {
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
              var ti = 0
              while (ti < targets.length && !anySameComp) {
                if (g.compOfDir(targets(ti)) == srcComp) anySameComp = true
                ti += 1
              }
              if (anySameComp) {
                // hop-cost memo (reference HopCache + cross-trie reuse):
                // the same (source cand, target set, cutoff) repeats across
                // thousands of trip patterns
                val key = HopCache.Key(fc.dirEdge,
                  math.round(fc.progr * 10000).toInt, baseCutoff,
                  tHash * 1000003L + cacheKeySalt)
                var hv = HopCache.get(key, targets)
                if (hv == null) {
                  // iterative deepening: cutoff doubling <= 3 steps (4.9)
                  var cutoff = baseCutoff
                  var step = 0
                  var done = false
                  while (!done && step <= MaxDoublingSteps) {
                    val reached = Dijkstra.oneToMany(g, ws, fc.dirEdge, init, targets,
                      cutoff, turnPen10, heur)
                    done = reached > 0 || step == MaxDoublingSteps
                    cutoff *= 2; step += 1
                  }
                  val costs = new Array[Long](targets.length)
                  val paths = new Array[Array[Int]](targets.length)
                  var i = 0
                  while (i < targets.length) {
                    val td = targets(i)
                    if (ws.isSettled(td)) {
                      costs(i) = ws.costOf(td)
                      paths(i) = Dijkstra.path(ws, fc.dirEdge, td)
                    } else costs(i) = Inf
                    i += 1
                  }
                  hv = HopCache.Val(targets, costs, paths)
                  HopCache.put(key, hv)
                  HopCache.Misses.increment()
                } else HopCache.Hits.increment()
                var t2 = 0
                while (t2 < to.length) {
                  val tc = to(t2)
                  if (tc.dirEdge >= 0) {
                    // index of this cand's edge in the target array
                    var ti2 = 0
                    while (ti2 < targets.length && targets(ti2) != tc.dirEdge) ti2 += 1
                    if (hv.costs(ti2) < Inf) {
                      // subtract un-traversed tail of the target edge
                      val tgtCost = g.dirCost10(tc.dirEdge)
                      var hop = hv.costs(ti2) -
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
                          bestPath(layer + 1)(t2) =
                            if (tc.dirEdge == fc.dirEdge && tc.progr >= fc.progr)
                              Array(fc.dirEdge)
                            else hv.paths(ti2)
                        }
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
              bestPath(layer + 1)(t3) = Array.empty[Int]
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
      val p = bestPath(l + 1)(t)
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
