package graft.geo

/** Pure-Scala geometry kernel (zero Spark deps).
  *
  * Re-derives the geometry semantics the reference engine uses everywhere
  * (haversine meters on WGS84 lat/lng, per-latitude degree->meter correction,
  * point->segment projection with progress, Douglas-Peucker simplification,
  * discrete Frechet distance): see /root/reference/src/pfaedle/Def.h:20-31,
  * /root/reference/src/pfaedle/router/ShapeBuilder.cpp:177-262,
  * /root/reference/src/shapevl/Collector.cpp:128-148.
  * All implementations are from scratch (standard published formulas).
  */
object Geo {
  /** Mean earth radius in meters (IUGG). */
  val EarthRadiusM: Double = 6371000.0
  /** Meters per degree of latitude (approx, spherical). */
  val MPerDeg: Double = EarthRadiusM * math.Pi / 180.0

  /** Haversine great-circle distance in meters between two WGS84 points. */
  def haversineM(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = p2 - p1
    val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** cos(lat) longitude shrink factor — the reference's latLngDistFactor
    * (used to treat small lat/lng deltas as locally planar meters). */
  def latLngDistFactor(lat: Double): Double = math.cos(math.toRadians(lat))

  /** Fast approximate planar distance in meters for SMALL deltas
    * (equirectangular projection) — what the reference uses for grid math. */
  def approxDistM(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dy = (lat2 - lat1) * MPerDeg
    val dx = (lon2 - lon1) * MPerDeg * latLngDistFactor((lat1 + lat2) / 2)
    math.sqrt(dx * dx + dy * dy)
  }

  /** Project point p onto segment (a,b) in locally-planar lng-corrected space.
    * Returns (progress in [0,1], projLat, projLon, distMeters). */
  def projectOnSegment(pLat: Double, pLon: Double,
                       aLat: Double, aLon: Double,
                       bLat: Double, bLon: Double): (Double, Double, Double, Double) = {
    val f = latLngDistFactor(pLat)
    // planar coords in degree-units with lng shrunk by cos(lat)
    val ax = aLon * f; val ay = aLat
    val bx = bLon * f; val by = bLat
    val px = pLon * f; val py = pLat
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 <= 0.0) 0.0
      else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    val qLat = aLat + t * (bLat - aLat)
    val qLon = aLon + t * (bLon - aLon)
    (t, qLat, qLon, haversineM(pLat, pLon, qLat, qLon))
  }

  /** Min distance (m) from point to polyline; also returns total progress in
    * [0,1] along the line (fraction of cumulative length) and projection point. */
  def projectOnPolyline(pLat: Double, pLon: Double,
                        line: Array[(Double, Double)]): (Double, Double, Double, Double) = {
    require(line.length >= 1)
    if (line.length == 1)
      return (0.0, line(0)._1, line(0)._2, haversineM(pLat, pLon, line(0)._1, line(0)._2))
    val segLens = new Array[Double](line.length - 1)
    var total = 0.0
    var i = 0
    while (i < line.length - 1) {
      segLens(i) = haversineM(line(i)._1, line(i)._2, line(i + 1)._1, line(i + 1)._2)
      total += segLens(i); i += 1
    }
    var best = Double.MaxValue
    var bestProgr = 0.0; var bestLat = line(0)._1; var bestLon = line(0)._2
    var acc = 0.0
    i = 0
    while (i < line.length - 1) {
      val (t, qLat, qLon, d) =
        projectOnSegment(pLat, pLon, line(i)._1, line(i)._2, line(i + 1)._1, line(i + 1)._2)
      if (d < best) {
        best = d
        bestProgr = if (total <= 0) 0.0 else (acc + t * segLens(i)) / total
        bestLat = qLat; bestLon = qLon
      }
      acc += segLens(i); i += 1
    }
    (bestProgr, bestLat, bestLon, best)
  }

  /** projectOnPolyline on parallel coordinate arrays — operation-for-
    * operation identical arithmetic (same segment order, same haversine
    * calls, same tie behavior: strict `<` keeps the first-best segment),
    * without the per-point tuple boxing of the Array[(Double, Double)]
    * form. Used by the codegen'd PolylineProject expression. */
  def projectOnPolylineArr(pLat: Double, pLon: Double,
                           lats: Array[Double], lons: Array[Double]):
      (Double, Double, Double, Double) = {
    val n = lats.length
    require(n >= 1)
    if (n == 1)
      return (0.0, lats(0), lons(0), haversineM(pLat, pLon, lats(0), lons(0)))
    val segLens = new Array[Double](n - 1)
    var total = 0.0
    var i = 0
    while (i < n - 1) {
      segLens(i) = haversineM(lats(i), lons(i), lats(i + 1), lons(i + 1))
      total += segLens(i); i += 1
    }
    var best = Double.MaxValue
    var bestProgr = 0.0; var bestLat = lats(0); var bestLon = lons(0)
    var acc = 0.0
    i = 0
    while (i < n - 1) {
      val (t, qLat, qLon, d) =
        projectOnSegment(pLat, pLon, lats(i), lons(i), lats(i + 1), lons(i + 1))
      if (d < best) {
        best = d
        bestProgr = if (total <= 0) 0.0 else (acc + t * segLens(i)) / total
        bestLat = qLat; bestLon = qLon
      }
      acc += segLens(i); i += 1
    }
    (bestProgr, bestLat, bestLon, best)
  }

  /** Polyline length in meters (sum of haversine segment lengths) —
    * EdgePL::getLength semantics (/root/reference/src/pfaedle/trgraph/EdgePL.cpp:78-86). */
  def polylineLenM(line: Array[(Double, Double)]): Double = {
    var s = 0.0; var i = 0
    while (i < line.length - 1) {
      s += haversineM(line(i)._1, line(i)._2, line(i + 1)._1, line(i + 1)._2); i += 1
    }
    s
  }

  /** Extract the sub-polyline between total progresses [p1, p2] (0..1 of length). */
  def subPolyline(line: Array[(Double, Double)], p1: Double, p2: Double): Array[(Double, Double)] = {
    if (line.length < 2) return line
    val lo = math.max(0.0, math.min(p1, p2)); val hi = math.min(1.0, math.max(p1, p2))
    val total = polylineLenM(line)
    if (total <= 0) return Array(line(0))
    val out = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    def interp(target: Double): (Double, Double) = {
      var acc = 0.0; var i = 0
      while (i < line.length - 1) {
        val sl = haversineM(line(i)._1, line(i)._2, line(i + 1)._1, line(i + 1)._2)
        if (acc + sl >= target || i == line.length - 2) {
          val t = if (sl <= 0) 0.0 else math.max(0.0, math.min(1.0, (target - acc) / sl))
          return (line(i)._1 + t * (line(i + 1)._1 - line(i)._1),
                  line(i)._2 + t * (line(i + 1)._2 - line(i)._2))
        }
        acc += sl; i += 1
      }
      line.last
    }
    val startM = lo * total; val endM = hi * total
    out += interp(startM)
    var acc = 0.0; var i = 0
    while (i < line.length - 1) {
      val sl = haversineM(line(i)._1, line(i)._2, line(i + 1)._1, line(i + 1)._2)
      val at = acc + sl
      if (at > startM && at < endM) out += line(i + 1)
      acc = at; i += 1
    }
    out += interp(endM)
    out.toArray
  }

  /** Douglas-Peucker polyline simplification with epsilon in meters
    * (reference default 0.5 m, OsmBuilder.cpp:1629-1636). */
  def simplify(line: Array[(Double, Double)], epsM: Double): Array[(Double, Double)] = {
    if (line.length <= 2) return line
    val keep = new Array[Boolean](line.length)
    keep(0) = true; keep(line.length - 1) = true
    def rec(lo: Int, hi: Int): Unit = {
      if (hi <= lo + 1) return
      var maxD = -1.0; var maxI = -1
      var i = lo + 1
      while (i < hi) {
        val (_, _, _, d) = projectOnSegment(line(i)._1, line(i)._2,
          line(lo)._1, line(lo)._2, line(hi)._1, line(hi)._2)
        if (d > maxD) { maxD = d; maxI = i }
        i += 1
      }
      if (maxD > epsM) { keep(maxI) = true; rec(lo, maxI); rec(maxI, hi) }
    }
    rec(0, line.length - 1)
    line.indices.filter(keep).map(line).toArray
  }

  /** Distance-only projectOnSegment — no tuple allocation (hot: once per
    * point per Douglas-Peucker recursion level in the match kernel). */
  def distToSegmentM(pLat: Double, pLon: Double,
                     aLat: Double, aLon: Double,
                     bLat: Double, bLon: Double): Double = {
    val f = latLngDistFactor(pLat)
    val ax = aLon * f; val ay = aLat
    val bx = bLon * f; val by = bLat
    val px = pLon * f; val py = pLat
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 <= 0.0) 0.0
      else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    haversineM(pLat, pLon, aLat + t * (bLat - aLat), aLon + t * (bLon - aLon))
  }

  /** Growable primitive (lat, lon) buffer — the match kernel's geometry
    * scratch. The tuple-based materialize path allocated one boxed
    * (Double, Double) per geometry point per hop (dirGeom + ArrayBuffer);
    * at 10^5 solved sequences x 10^2 points that allocation rate was a
    * measurable share of executor GC, and GC pauses are what poisons the
    * N-vs-4N scaling measurement on a shared heap. */
  final class PtBuf(initCap: Int) {
    var lat = new Array[Double](math.max(4, initCap))
    var lon = new Array[Double](math.max(4, initCap))
    var n = 0
    def clear(): Unit = n = 0
    private def grow(): Unit = {
      val c = lat.length * 2
      lat = java.util.Arrays.copyOf(lat, c)
      lon = java.util.Arrays.copyOf(lon, c)
    }
    /** append, skipping an exact repeat of the last point */
    def addDedup(la: Double, lo: Double): Unit = {
      if (n > 0 && math.abs(lat(n - 1) - la) <= 1e-12 &&
          math.abs(lon(n - 1) - lo) <= 1e-12) return
      if (n == lat.length) grow()
      lat(n) = la; lon(n) = lo; n += 1
    }
  }

  /** Append the sub-polyline between total progresses [p1, p2] of a STORED
    * edge geometry (primitive arrays, optionally traversed in reverse for
    * the odd directed edge) into `out` — the allocation-free equivalent of
    * subPolyline(dirGeom(de), p1, p2). Progress is measured along the
    * traversal direction, exactly like the tuple path. */
  def subPolylineInto(gLat: Array[Double], gLon: Array[Double], rev: Boolean,
                      p1: Double, p2: Double, out: PtBuf): Unit = {
    val len = gLat.length
    @inline def la(k: Int): Double = if (rev) gLat(len - 1 - k) else gLat(k)
    @inline def lo(k: Int): Double = if (rev) gLon(len - 1 - k) else gLon(k)
    if (len == 0) return
    if (len < 2) { out.addDedup(la(0), lo(0)); return }
    val loP = math.max(0.0, math.min(p1, p2)); val hiP = math.min(1.0, math.max(p1, p2))
    var total = 0.0
    var i = 0
    while (i < len - 1) {
      total += haversineM(la(i), lo(i), la(i + 1), lo(i + 1)); i += 1
    }
    if (total <= 0) { out.addDedup(la(0), lo(0)); return }
    // interp(target): walk segments until the target meter mark
    def interpInto(target: Double): Unit = {
      var acc = 0.0; var k = 0
      while (k < len - 1) {
        val sl = haversineM(la(k), lo(k), la(k + 1), lo(k + 1))
        if (acc + sl >= target || k == len - 2) {
          val t = if (sl <= 0) 0.0 else math.max(0.0, math.min(1.0, (target - acc) / sl))
          out.addDedup(la(k) + t * (la(k + 1) - la(k)), lo(k) + t * (lo(k + 1) - lo(k)))
          return
        }
        acc += sl; k += 1
      }
      out.addDedup(la(len - 1), lo(len - 1))
    }
    val startM = loP * total; val endM = hiP * total
    interpInto(startM)
    var acc = 0.0
    i = 0
    while (i < len - 1) {
      val sl = haversineM(la(i), lo(i), la(i + 1), lo(i + 1))
      val at = acc + sl
      if (at > startM && at < endM) out.addDedup(la(i + 1), lo(i + 1))
      acc = at; i += 1
    }
    interpInto(endM)
  }

  /** Append a whole stored edge geometry (direction-aware) into `out`. */
  def geomInto(gLat: Array[Double], gLon: Array[Double], rev: Boolean,
               out: PtBuf): Unit = {
    val len = gLat.length
    var k = 0
    while (k < len) {
      if (rev) out.addDedup(gLat(len - 1 - k), gLon(len - 1 - k))
      else out.addDedup(gLat(k), gLon(k))
      k += 1
    }
  }

  /** Douglas-Peucker keep-mask over a primitive point buffer prefix [0, n)
    * — same recursion as simplify(), zero allocation beyond the mask. */
  def simplifyMask(lat: Array[Double], lon: Array[Double], n: Int,
                   epsM: Double): Array[Boolean] = {
    val keep = new Array[Boolean](n)
    if (n == 0) return keep
    keep(0) = true; keep(n - 1) = true
    if (n <= 2) return keep
    def rec(lo: Int, hi: Int): Unit = {
      if (hi <= lo + 1) return
      var maxD = -1.0; var maxI = -1
      var i = lo + 1
      while (i < hi) {
        val d = distToSegmentM(lat(i), lon(i), lat(lo), lon(lo), lat(hi), lon(hi))
        if (d > maxD) { maxD = d; maxI = i }
        i += 1
      }
      if (maxD > epsM) { keep(maxI) = true; rec(lo, maxI); rec(maxI, hi) }
    }
    rec(0, n - 1)
    keep
  }

  /** Resample a polyline so consecutive points are at most stepM apart
    * (shapevl samples every 25 m — ShapevlMain.cpp:40). */
  def densify(line: Array[(Double, Double)], stepM: Double): Array[(Double, Double)] = {
    if (line.length < 2) return line
    val out = scala.collection.mutable.ArrayBuffer[(Double, Double)](line(0))
    var i = 0
    while (i < line.length - 1) {
      val (aLat, aLon) = line(i); val (bLat, bLon) = line(i + 1)
      val d = haversineM(aLat, aLon, bLat, bLon)
      val n = math.max(1, math.ceil(d / stepM).toInt)
      var k = 1
      while (k <= n) {
        out += ((aLat + (bLat - aLat) * k / n, aLon + (bLon - aLon) * k / n))
        k += 1
      }
      i += 1
    }
    out.toArray
  }

  /** Discrete Frechet distance (max coupling distance, haversine meters) —
    * shapevl's frechetDistHav semantics (Collector.cpp:128-148): both lines
    * densified at stepM, then classic DP. */
  def frechetDistHav(a0: Array[(Double, Double)], b0: Array[(Double, Double)], stepM: Double): Double = {
    val a = densify(a0, stepM); val b = densify(b0, stepM)
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.MaxValue
    var prev = new Array[Double](m)
    var cur = new Array[Double](m)
    var j = 0
    while (j < m) {
      val d = haversineM(a(0)._1, a(0)._2, b(j)._1, b(j)._2)
      prev(j) = if (j == 0) d else math.max(prev(j - 1), d)
      j += 1
    }
    var i = 1
    while (i < n) {
      j = 0
      while (j < m) {
        val d = haversineM(a(i)._1, a(i)._2, b(j)._1, b(j)._2)
        val reach =
          if (j == 0) prev(0)
          else math.min(math.min(prev(j), prev(j - 1)), cur(j - 1))
        cur(j) = math.max(reach, d)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m - 1)
  }

  /** Accumulated (summed) Frechet coupling distance — shapevl's
    * accFrechetDistCHav (Collector.cpp:543-547). */
  def accFrechetDistHav(a0: Array[(Double, Double)], b0: Array[(Double, Double)], stepM: Double): Double = {
    val a = densify(a0, stepM); val b = densify(b0, stepM)
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.MaxValue
    var prev = new Array[Double](m)
    var cur = new Array[Double](m)
    var j = 0
    while (j < m) {
      val d = haversineM(a(0)._1, a(0)._2, b(j)._1, b(j)._2)
      prev(j) = if (j == 0) d else prev(j - 1) + d
      j += 1
    }
    var i = 1
    while (i < n) {
      j = 0
      while (j < m) {
        val d = haversineM(a(i)._1, a(i)._2, b(j)._1, b(j)._2)
        val reach =
          if (j == 0) prev(0)
          else math.min(math.min(prev(j), prev(j - 1)), cur(j - 1))
        cur(j) = reach + d
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m - 1)
  }

  /** WGS84 -> web-Mercator meters (trie point dedup + GeoJSON in the
    * reference, TripTrie.tpp:51-52). */
  def latLngToWebMerc(lat: Double, lon: Double): (Double, Double) = {
    val x = lon * 20037508.34 / 180.0
    val clampedLat = math.max(-89.99999, math.min(89.99999, lat))
    val y = math.log(math.tan((90.0 + clampedLat) * math.Pi / 360.0)) / (math.Pi / 180.0) *
      20037508.34 / 180.0
    (x, y)
  }

  /** Inner angle (degrees) at vertex b of polyline a-b-c — turn detection
    * (reference innerProd usage, Weights.cpp:136-137). */
  def innerAngleDeg(aLat: Double, aLon: Double, bLat: Double, bLon: Double,
                    cLat: Double, cLon: Double): Double = {
    val f = latLngDistFactor(bLat)
    val v1x = (aLon - bLon) * f; val v1y = aLat - bLat
    val v2x = (cLon - bLon) * f; val v2y = cLat - bLat
    val n1 = math.sqrt(v1x * v1x + v1y * v1y)
    val n2 = math.sqrt(v2x * v2x + v2y * v2y)
    if (n1 <= 0 || n2 <= 0) return 180.0
    val cos = math.max(-1.0, math.min(1.0, (v1x * v2x + v1y * v2y) / (n1 * n2)))
    math.toDegrees(math.acos(cos))
  }

  /** Seconds -> u32 decisecond fixed-point, ceil-rounded + saturating —
    * reference costToInt (OsmBuilder.cpp:1824-1837). Ceil keeps the Dijkstra
    * PQ monotone. Saturates at Int.MaxValue (we use Long math internally). */
  def costToInt(seconds: Double): Long = {
    val c = math.ceil(seconds * 10.0)
    if (c.isNaN || c < 0) 0L
    else if (c >= Int.MaxValue.toDouble) Int.MaxValue.toLong
    else c.toLong
  }
}
