package graft.geo

/** Hierarchical lat/lng grid-cell index ("GCell") — our from-scratch analog of
  * H3/S2 cell ids and of the reference's uniform util::geo::Grid
  * (/root/reference/src/pfaedle/trgraph/Graph.h:24-28, default cell 2000 m via
  * Config.gridSize, /root/reference/src/pfaedle/config/PfaedleConfig.h:41).
  *
  * Design goals: (a) pure integer math so the encoding is reproducible in ANSI
  * SQL (DuckDB oracle) and codegen-friendly in Catalyst; (b) hierarchical —
  * parent(cell) at res r-1 halves row/col, enabling coarse partition pruning;
  * (c) k-ring = the (2k+1)^2 row/col neighborhood, the exact analog of the
  * reference grid's padded-box lookup (OsmBuilder.cpp:1231-1247).
  *
  * Layout of the 64-bit id:  [res:6 bits | row:29 bits | col:29 bits]
  *   cellDeg(r) = 90 / 2^r degrees;  row = floor((lat+90)/cellDeg) in [0, 2*2^r)
  *                                   col = floor((lon+180)/cellDeg) in [0, 4*2^r)
  * Valid for 0 <= r <= 26. r=12 gives ~2.4 km cells (the reference's 2 km grid).
  */
object Cell {
  val MaxRes = 26
  /** Default resolution matching the reference's 2000 m grid. */
  val DefaultRes = 12

  @inline def cellDeg(res: Int): Double = 90.0 / (1L << res)

  def encode(lat: Double, lon: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"res out of range: $res")
    val cd = cellDeg(res)
    val maxRow = (2L << res) - 1 // 2*2^r - 1
    val maxCol = (4L << res) - 1
    val row = math.min(maxRow, math.max(0L, math.floor((lat + 90.0) / cd).toLong))
    val col = math.min(maxCol, math.max(0L, math.floor((lon + 180.0) / cd).toLong))
    pack(res, row, col)
  }

  @inline def pack(res: Int, row: Long, col: Long): Long =
    (res.toLong << 58) | (row << 29) | col

  @inline def res(cell: Long): Int = ((cell >>> 58) & 0x3f).toInt
  @inline def row(cell: Long): Long = (cell >>> 29) & 0x1fffffffL
  @inline def col(cell: Long): Long = cell & 0x1fffffffL

  /** Center of the cell (lat, lon). */
  def center(cell: Long): (Double, Double) = {
    val r = res(cell); val cd = cellDeg(r)
    ((row(cell) + 0.5) * cd - 90.0, (col(cell) + 0.5) * cd - 180.0)
  }

  /** Cell bounds (latMin, lonMin, latMax, lonMax). */
  def bounds(cell: Long): (Double, Double, Double, Double) = {
    val r = res(cell); val cd = cellDeg(r)
    val la = row(cell) * cd - 90.0; val lo = col(cell) * cd - 180.0
    (la, lo, la + cd, lo + cd)
  }

  /** Parent at resolution pRes < res(cell) — hierarchy for partition pruning. */
  def parent(cell: Long, pRes: Int): Long = {
    val r = res(cell)
    require(pRes <= r, s"parent res $pRes > cell res $r")
    val shift = r - pRes
    pack(pRes, row(cell) >> shift, col(cell) >> shift)
  }

  /** k-ring: all cells within Chebyshev distance k (the (2k+1)^2 block),
    * clamped at lat poles, wrapped in lon. Deterministic row-major order. */
  def kRing(cell: Long, k: Int): Array[Long] = {
    val r = res(cell)
    val nRows = 2L << r
    val nCols = 4L << r
    val r0 = row(cell); val c0 = col(cell)
    val out = new scala.collection.mutable.ArrayBuffer[Long]((2 * k + 1) * (2 * k + 1))
    var dr = -k
    while (dr <= k) {
      val rr = r0 + dr
      if (rr >= 0 && rr < nRows) {
        var dc = -k
        while (dc <= k) {
          val cc = ((c0 + dc) % nCols + nCols) % nCols
          out += pack(r, rr, cc)
          dc += 1
        }
      }
      dr += 1
    }
    out.toArray
  }

  /** Ring radius k needed so a k-ring covers a distance of dM meters around a
    * point at latitude lat (the analog of the reference grid's padded box at
    * maxSnapDistance). Conservative: uses the shrunken longitude extent. */
  def kForMeters(dM: Double, lat: Double, res: Int): Int = {
    val cdM = cellDeg(res) * Geo.MPerDeg * math.max(0.1, Geo.latLngDistFactor(lat))
    math.max(1, math.ceil(dM / cdM).toInt)
  }

  /** All cells at `res` intersecting the bbox (latMin..latMax, lonMin..lonMax).
    * Used to cover a polyline/edge with cells. */
  def cover(latMin: Double, lonMin: Double, latMax: Double, lonMax: Double, res: Int): Array[Long] = {
    val cd = cellDeg(res)
    val nRows = 2L << res; val nCols = 4L << res
    val r0 = math.max(0L, math.floor((latMin + 90.0) / cd).toLong)
    val r1 = math.min(nRows - 1, math.floor((latMax + 90.0) / cd).toLong)
    val c0 = math.max(0L, math.floor((lonMin + 180.0) / cd).toLong)
    val c1 = math.min(nCols - 1, math.floor((lonMax + 180.0) / cd).toLong)
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var rr = r0
    while (rr <= r1) {
      var cc = c0
      while (cc <= c1) { out += pack(res, rr, cc); cc += 1 }
      rr += 1
    }
    out.toArray
  }

  /** Cells covering a polyline: union of per-segment bbox covers (cells are
    * large vs segment steps at our resolutions; exactness not required — this
    * is an over-approximation used as a join pre-filter, like the reference's
    * EdgeGrid.add of the edge bbox). */
  def coverPolyline(line: Array[(Double, Double)], res: Int): Array[Long] = {
    val set = scala.collection.mutable.LinkedHashSet[Long]()
    var i = 0
    while (i < math.max(1, line.length - 1)) {
      val (aLat, aLon) = line(i)
      val (bLat, bLon) = line(math.min(i + 1, line.length - 1))
      cover(math.min(aLat, bLat), math.min(aLon, bLon),
            math.max(aLat, bLat), math.max(aLon, bLon), res).foreach(set += _)
      i += 1
    }
    set.toArray
  }
}
