package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.geo.{Cell, Geo}
import graft.functions.StringSim

/** Property-based checks of the pure geometry/similarity kernels — the
  * algebraic laws the operator implementations rely on (metric axioms,
  * range bounds, clamping, subset/endpoint preservation) over randomized
  * inputs, complementing the example-based specs. Runs under `sbt test`
  * via ScalaCheck's own sbt test framework. */
object PropertySpec extends Properties("graft.kernels") {

  // keep coordinates away from the poles/antimeridian where the planar
  // cos(lat) approximation the engine documents is out of contract
  private val lat = Gen.choose(-65.0, 65.0)
  private val lng = Gen.choose(-170.0, 170.0)
  private val word = Gen.choose(1, 8).flatMap(n =>
    Gen.stringOfN(n, Gen.alphaNumChar))
  private val nameGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")
  private val localPt =
    for { a <- Gen.choose(47.0, 48.0); o <- Gen.choose(8.0, 9.0) } yield (a, o)
  private def lineGen(maxN: Int) =
    Gen.choose(2, maxN).flatMap(n => Gen.listOfN(n, localPt).map(_.toArray))

  property("haversine symmetric, non-negative, zero on self") =
    forAll(lat, lng, lat, lng) { (a1, o1, a2, o2) =>
      val d = Geo.haversineM(a1, o1, a2, o2)
      d >= 0.0 &&
        math.abs(d - Geo.haversineM(a2, o2, a1, o1)) < 1e-9 &&
        Geo.haversineM(a1, o1, a1, o1) == 0.0
    }

  property("haversine triangle inequality") =
    forAll(lat, lng, lat, lng, lat, lng) { (a1, o1, a2, o2, a3, o3) =>
      Geo.haversineM(a1, o1, a3, o3) <=
        Geo.haversineM(a1, o1, a2, o2) + Geo.haversineM(a2, o2, a3, o3) + 1e-6
    }

  // LOCAL geometry only — the planar cos(lat) projection is documented
  // for map-scale segments (meters to km); hemisphere-spanning segments
  // where haversine wraps the antimeridian are out of contract
  property("projectOnSegment: t in [0,1], projection inside bbox, " +
           "no worse than either endpoint (local geometry)") =
    forAll(localPt, localPt, localPt) { case ((pa, po), (aa, ao), (ba, bo)) =>
      val (t, qLat, qLon, d) = Geo.projectOnSegment(pa, po, aa, ao, ba, bo)
      val dA = Geo.haversineM(pa, po, aa, ao)
      val dB = Geo.haversineM(pa, po, ba, bo)
      t >= 0.0 && t <= 1.0 &&
        qLat >= math.min(aa, ba) - 1e-12 && qLat <= math.max(aa, ba) + 1e-12 &&
        qLon >= math.min(ao, bo) - 1e-12 && qLon <= math.max(ao, bo) + 1e-12 &&
        // the projection minimizes PLANAR distance; allow the documented
        // cos(lat)-approximation gap vs the haversine endpoint distances
        d <= math.min(dA, dB) * 1.01 + 1e-6
    }

  property("simplify: subset of input, endpoints kept, dropped points " +
           "within eps of the simplified line") =
    forAll(lineGen(12)) { line =>
      val epsM = 500.0
      val simp = Geo.simplify(line, epsM)
      val set = line.toSet
      simp.head == line.head && simp.last == line.last &&
        simp.forall(set.contains) &&
        line.forall { case (la, lo) =>
          Geo.projectOnPolyline(la, lo, simp)._1 <= epsM * 1.05 + 1e-6
        }
    }

  property("polylineLenM reversal-invariant; simplify never lengthens") =
    forAll(lineGen(12)) { line =>
      val len = Geo.polylineLenM(line)
      math.abs(len - Geo.polylineLenM(line.reverse)) < 1e-6 &&
        Geo.polylineLenM(Geo.simplify(line, 200.0)) <= len + 1e-6
    }

  property("frechet: zero on self, symmetric, non-negative") =
    forAll(lineGen(6), lineGen(6)) { (a, b) =>
      val ab = Geo.frechetDistHav(a, b, 100.0)
      Geo.frechetDistHav(a, a, 100.0) <= 1e-6 &&
        ab >= 0.0 &&
        math.abs(ab - Geo.frechetDistHav(b, a, 100.0)) < 1e-6
    }

  property("cell encode deterministic; kRing = (2k+1)^2 distinct cells " +
           "containing the center") =
    forAll(lat, lng, Gen.choose(1, 3)) { (a, o, k) =>
      val res = 13
      val c = Cell.encode(a, o, res)
      val ring = Cell.kRing(c, k)
      c == Cell.encode(a, o, res) &&
        ring.count(_ == c) == 1 &&
        ring.length == (2 * k + 1) * (2 * k + 1) &&
        ring.distinct.length == ring.length
    }

  property("editDist: metric axioms + length bounds") =
    forAll(word, word, word) { (a, b, c) =>
      val ab = StringSim.editDist(a, b)
      StringSim.editDist(a, a) == 0 &&
        ab == StringSim.editDist(b, a) &&
        ab >= math.abs(a.length - b.length) &&
        ab <= math.max(a.length, b.length) &&
        StringSim.editDist(a, c) <= ab + StringSim.editDist(b, c)
    }

  property("similarity scores in [0,1], 1.0 on self; jaccard/edit/line " +
           "symmetric") =
    forAll(nameGen, nameGen) { (a, b) =>
      val all = Seq[(String, String) => Double](StringSim.jaccardSimi,
        StringSim.editSimi, StringSim.btsSimi, StringSim.lineSimi)
      val symmetric = all.take(2) :+ all.last
      all.forall { f =>
        val s = f(a, b); s >= 0.0 && s <= 1.0 && f(a, a) == 1.0
      } && symmetric.forall(f => math.abs(f(a, b) - f(b, a)) < 1e-9)
    }

  // btsSimi compares the SHORTER name against token subsequences of the
  // longer (the reference's best-token-subset direction); at equal
  // lengths the role tie-breaks on argument order, so full symmetry is
  // deliberately NOT a law. What does hold: order can only change the
  // result when lengths tie, and each direction dominates plain edit
  // similarity of the full strings.
  property("btsSimi >= editSimi, order-stable when lengths differ") =
    forAll(nameGen, nameGen) { (a, b) =>
      StringSim.btsSimi(a, b) + 1e-12 >=
        StringSim.editSimi(a.toLowerCase, b.toLowerCase) &&
        (a.length == b.length ||
          math.abs(StringSim.btsSimi(a, b) - StringSim.btsSimi(b, a)) < 1e-9)
    }

  property("costToInt monotone, zero at zero") =
    forAll(Gen.choose(0.0, 1e6), Gen.choose(0.0, 1e6)) { (x, y) =>
      val (lo, hi) = if (x <= y) (x, y) else (y, x)
      Geo.costToInt(lo) <= Geo.costToInt(hi) && Geo.costToInt(0.0) == 0L
    }

  property("gtfs time parse inverts formatting incl. >24h service days") =
    forAll(Gen.choose(0, 47), Gen.choose(0, 59), Gen.choose(0, 59)) { (h, m, s) =>
      StringSim.gtfsTimeToSec(f"$h%02d:$m%02d:$s%02d") == h * 3600 + m * 60 + s
    }

  property("cell hierarchy: parent(encode(p, res)) == encode(p, pRes) — " +
           "the law partition pruning relies on") =
    forAll(lat, lng, Gen.choose(8, 14), Gen.choose(1, 6)) { (a, o, res, up) =>
      val pRes = res - up
      Cell.parent(Cell.encode(a, o, res), pRes) == Cell.encode(a, o, pRes)
    }

  property("cell bounds contain the encoded point; center re-encodes to " +
           "the same cell") =
    forAll(lat, lng, Gen.choose(8, 14)) { (a, o, res) =>
      val c = Cell.encode(a, o, res)
      val (laMin, loMin, laMax, loMax) = Cell.bounds(c)
      val (ca, co) = Cell.center(c)
      a >= laMin && a <= laMax && o >= loMin && o <= loMax &&
        Cell.encode(ca, co, res) == c
    }

  property("bbox cover: complete (every sampled inner point's cell is in " +
           "the cover) and tight (every cover cell intersects the bbox)") =
    forAll(localPt, Gen.choose(0.001, 0.05), Gen.choose(0.001, 0.05),
           Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) {
      case ((la, lo), dLat, dLng, fa, fo) =>
        val res = 12
        val cover = Cell.cover(la, lo, la + dLat, lo + dLng, res).toSet
        val pa = la + fa * dLat; val po = lo + fo * dLng
        val eps = 1e-9
        cover.contains(Cell.encode(pa, po, res)) &&
          cover.forall { c =>
            val (bLaMin, bLoMin, bLaMax, bLoMax) = Cell.bounds(c)
            bLaMax >= la - eps && bLaMin <= la + dLat + eps &&
              bLoMax >= lo - eps && bLoMin <= lo + dLng + eps
          }
    }

  property("kForMeters: the chosen ring really reaches dM meters") =
    forAll(localPt, Gen.choose(100.0, 5000.0)) { case ((la, lo), dM) =>
      val res = 13
      val k = Cell.kForMeters(dM, la, res)
      // a point dM meters due east must land inside the k-ring
      val dLng = dM / (111320.0 * math.cos(math.toRadians(la)))
      val c0 = Cell.encode(la, lo, res)
      val ct = Cell.encode(la, lo + dLng, res)
      k >= 0 && Cell.kRing(c0, k).contains(ct)
    }

  property("webMercator x strictly monotone in lng at fixed lat") =
    forAll(lat, lng, lng) { (a, o1, o2) =>
      val x1 = Geo.latLngToWebMerc(a, o1)._1
      val x2 = Geo.latLngToWebMerc(a, o2)._1
      if (o1 < o2) x1 < x2 else if (o1 > o2) x1 > x2 else x1 == x2
    }
}
