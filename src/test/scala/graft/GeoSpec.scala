package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.{Cell, Geo}

class GeoSpec extends AnyFunSuite {
  test("haversine known distances") {
    // Freiburg Hbf -> Freiburg Bertoldsbrunnen, ~ 730 m (reference city)
    val d = Geo.haversineM(47.9976, 7.8403, 47.9953, 7.8496)
    assert(d > 600 && d < 900, s"got $d")
    // symmetry + identity
    assert(Geo.haversineM(48.0, 7.8, 48.0, 7.8) == 0.0)
    assert(math.abs(Geo.haversineM(48, 7, 49, 8) - Geo.haversineM(49, 8, 48, 7)) < 1e-9)
    // one degree of latitude ~ 111.2 km
    val dLat = Geo.haversineM(0, 0, 1, 0)
    assert(math.abs(dLat - 111194.9) < 10.0, s"got $dLat")
  }

  test("projectOnSegment clamps and interpolates") {
    // horizontal segment at equator, point above midpoint
    val (t, qLat, qLon, d) = Geo.projectOnSegment(0.001, 0.5, 0.0, 0.0, 0.0, 1.0)
    assert(math.abs(t - 0.5) < 1e-9)
    assert(math.abs(qLat) < 1e-12 && math.abs(qLon - 0.5) < 1e-9)
    assert(math.abs(d - 0.001 * Geo.MPerDeg) < 0.5)
    // beyond endpoint -> clamp to 1
    val (t2, _, _, _) = Geo.projectOnSegment(0.0, 2.0, 0.0, 0.0, 0.0, 1.0)
    assert(t2 == 1.0)
    // degenerate segment
    val (t3, _, _, d3) = Geo.projectOnSegment(0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    assert(t3 == 0.0 && d3 > 0)
  }

  test("douglas-peucker removes collinear, keeps corners") {
    val line = Array((0.0, 0.0), (0.0, 0.001), (0.0, 0.002), (0.01, 0.002))
    val simp = Geo.simplify(line, 0.5)
    assert(simp.length == 3)
    assert(simp(0) == line(0) && simp(1) == line(2) && simp(2) == line(3))
    // epsilon larger than the corner deviation collapses everything
    val simp2 = Geo.simplify(line, 1e7)
    assert(simp2.length == 2)
  }

  test("frechet: identical lines -> 0, parallel offset -> offset dist") {
    val a = Array((0.0, 0.0), (0.0, 0.01))
    val b = Array((0.001, 0.0), (0.001, 0.01)) // ~111 m north of a
    assert(Geo.frechetDistHav(a, a, 25.0) == 0.0)
    val f = Geo.frechetDistHav(a, b, 25.0)
    assert(f > 100 && f < 125, s"got $f")
    // acc frechet of identical lines is 0
    assert(Geo.accFrechetDistHav(a, a, 25.0) == 0.0)
  }

  test("costToInt: ceil, clamp, saturate (reference OsmBuilder.cpp:1824-1837)") {
    assert(Geo.costToInt(1.0) == 10L)
    assert(Geo.costToInt(0.11) == 2L) // ceil(1.1) = 2
    assert(Geo.costToInt(-5.0) == 0L)
    assert(Geo.costToInt(1e12) == Int.MaxValue.toLong)
  }

  test("subPolyline extracts middle") {
    val line = Array((0.0, 0.0), (0.0, 0.01), (0.0, 0.02))
    val sub = Geo.subPolyline(line, 0.25, 0.75)
    assert(math.abs(sub.head._2 - 0.005) < 1e-9)
    assert(math.abs(sub.last._2 - 0.015) < 1e-9)
    assert(sub.exists(p => math.abs(p._2 - 0.01) < 1e-12))
  }

  test("innerAngleDeg: straight=180, right turn=90") {
    assert(math.abs(Geo.innerAngleDeg(0, 0, 0, 1, 0, 2) - 180.0) < 1e-6)
    assert(math.abs(Geo.innerAngleDeg(0, 0, 0, 1, 1, 1) - 90.0) < 1e-6)
  }
}

class CellSpec extends AnyFunSuite {
  test("encode/decode roundtrip at several resolutions") {
    for (res <- Seq(0, 5, 12, 20, 26); (lat, lon) <- Seq((47.99, 7.84), (-33.9, 151.2), (0.0, 0.0), (89.9, -179.9))) {
      val c = Cell.encode(lat, lon, res)
      assert(Cell.res(c) == res)
      val (cLat, cLon) = Cell.center(c)
      val cd = Cell.cellDeg(res)
      assert(math.abs(cLat - lat) <= cd, s"res=$res lat=$lat center=$cLat")
      assert(math.abs(cLon - lon) <= cd)
      val (la0, lo0, la1, lo1) = Cell.bounds(c)
      assert(lat >= la0 && lat < la1 + 1e-12 && lon >= lo0 && lon < lo1 + 1e-12)
    }
  }

  test("parent contains child") {
    val c = Cell.encode(47.99, 7.84, 14)
    val p = Cell.parent(c, 10)
    assert(Cell.res(p) == 10)
    val (la0, lo0, la1, lo1) = Cell.bounds(p)
    val (cla, clo) = Cell.center(c)
    assert(cla >= la0 && cla <= la1 && clo >= lo0 && clo <= lo1)
    assert(Cell.parent(c, 14) == c)
  }

  test("kRing sizes and containment") {
    val c = Cell.encode(47.99, 7.84, 12)
    assert(Cell.kRing(c, 0).toSeq == Seq(c))
    val r1 = Cell.kRing(c, 1)
    assert(r1.length == 9 && r1.contains(c))
    assert(Cell.kRing(c, 2).length == 25)
    // all ring-1 cells are adjacent (row/col within 1)
    r1.foreach { n =>
      assert(math.abs(Cell.row(n) - Cell.row(c)) <= 1)
    }
  }

  test("kRing clamps at pole, wraps at antimeridian") {
    val pole = Cell.encode(89.99, 0.0, 4)
    assert(Cell.kRing(pole, 1).length == 6) // top row clipped
    val anti = Cell.encode(0.0, 179.99, 4)
    val ring = Cell.kRing(anti, 1)
    assert(ring.length == 9)
    assert(ring.exists(n => Cell.col(n) == 0)) // wrapped
  }

  test("neighbor points at ~2km fall in 1-ring at res 12") {
    val c = Cell.encode(47.99, 7.84, Cell.DefaultRes)
    val k = Cell.kForMeters(2000.0, 47.99, Cell.DefaultRes)
    val ring = Cell.kRing(c, k).toSet
    // a point 1.9 km east
    val lon2 = 7.84 + 1900.0 / (Geo.MPerDeg * Geo.latLngDistFactor(47.99))
    assert(ring.contains(Cell.encode(47.99, lon2, Cell.DefaultRes)))
  }

  test("cover bbox includes corners") {
    val cells = Cell.cover(47.9, 7.8, 48.0, 7.9, 12).toSet
    assert(cells.contains(Cell.encode(47.9, 7.8, 12)))
    assert(cells.contains(Cell.encode(48.0 - 1e-9, 7.9 - 1e-9, 12)))
    assert(cells.nonEmpty)
  }

  test("encoding matches the SQL-oracle formula (pure integer math)") {
    // gcell must equal (res<<58)|(floor((lat+90)/cd)<<29)|floor((lon+180)/cd)
    val lat = 47.9976; val lon = 7.8403; val res = 12
    val cd = 90.0 / (1 << res)
    val expected = (res.toLong << 58) |
      (math.floor((lat + 90.0) / cd).toLong << 29) |
      math.floor((lon + 180.0) / cd).toLong
    assert(Cell.encode(lat, lon, res) == expected)
  }
}
