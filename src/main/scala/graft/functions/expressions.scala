package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

import graft.geo.{Cell, Geo}

/** Codegen-friendly static helpers callable from generated Java
  * (Scala top-level objects emit static forwarders). */
object GeoOps {
  def kRingArray(cell: Long, k: Int): ArrayData =
    new GenericArrayData(Cell.kRing(cell, k))
  def coverArray(latMin: Double, lonMin: Double, latMax: Double, lonMax: Double, res: Int): ArrayData =
    new GenericArrayData(Cell.cover(latMin, lonMin, latMax, lonMax, res))

  /** geom bbox + cell cover in ONE pass over the point structs. Replaces
    * array_min/array_max over four interpreted transform(geom, ...) passes
    * feeding the CodegenFallback CellsCover — per edge that was 4 array
    * allocations + interpreted lambda evals; this is a tight loop. Returns
    * null for an empty geom (array_min of an empty array was null, which
    * the null-intolerant CellsCover propagated). */
  def geomCoverArray(geom: ArrayData, res: Int): ArrayData = {
    val n = geom.numElements()
    if (n == 0) return null
    var latMin = Double.MaxValue; var latMax = -Double.MaxValue
    var lonMin = Double.MaxValue; var lonMax = -Double.MaxValue
    var i = 0
    while (i < n) {
      val p = geom.getStruct(i, 2)
      val la = p.getDouble(0); val lo = p.getDouble(1)
      if (la < latMin) latMin = la
      if (la > latMax) latMax = la
      if (lo < lonMin) lonMin = lo
      if (lo > lonMax) lonMax = lo
      i += 1
    }
    new GenericArrayData(Cell.cover(latMin, lonMin, latMax, lonMax, res))
  }

  /** point-to-polyline projection on parallel lat/lon arrays; identical
    * arithmetic to Geo.projectOnPolyline (delegates to the same kernel).
    * Returns the (progr, lat, lon, dist) struct the old ScalaUDF produced. */
  def projectArrays(pLat: Double, pLon: Double,
                    glat: ArrayData, glon: ArrayData): InternalRow = {
    val r = Geo.projectOnPolylineArr(pLat, pLon,
      glat.toDoubleArray(), glon.toDoubleArray())
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](r._1, r._2, r._3, r._4))
  }
}

/** gcell(lat, lon, res) -> long grid-cell id (our H3/S2 analog; see
  * graft.geo.Cell). Batched + whole-stage-codegen'd: the north star's
  * "H3/S2 cell encoding in batched Catalyst UDFs" — the encoding is pure
  * integer math inlined into generated Java, no boxing. */
case class CellEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gcell"
  override protected def nullSafeEval(lat: Any, lon: Any, res: Any): Any =
    Cell.encode(lat.asInstanceOf[Double], lon.asInstanceOf[Double], res.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lon, res) => s"graft.geo.Cell.encode($lat, $lon, $res)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** gcell_parent(cell, parentRes) -> long. Hierarchical coarsening for
  * partition pruning (H3-parent analog). */
case class CellParent(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gcell_parent"
  override protected def nullSafeEval(c: Any, r: Any): Any =
    Cell.parent(c.asInstanceOf[Long], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.geo.Cell.parent($c, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** kring(cell, k) -> array<long>: the (2k+1)^2 neighborhood, the join key
  * generator for broadcast spatial joins (analog of the reference grid's
  * padded-box get, /root/reference/src/pfaedle/osm/OsmBuilder.cpp:1231-1247). */
case class KRing(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kring"
  override protected def nullSafeEval(c: Any, k: Any): Any =
    GeoOps.kRingArray(c.asInstanceOf[Long], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, k) => s"graft.functions.GeoOps.kRingArray($c, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** haversine_m(lat1, lon1, lat2, lon2) -> double meters. */
case class HaversineM(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "haversine_m"
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Geo.haversineM(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.geo.Geo.haversineM($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** gcells_cover(latMin, lonMin, latMax, lonMax, res) -> array<long>:
  * cells intersecting a bbox (edge/polyline coverage generator). Runs once
  * per edge at graph-build time, not in the matching hot path, so the
  * interpreted CodegenFallback path is fine. */
case class CellsCover(children: Seq[Expression])
    extends Expression with codegen.CodegenFallback {
  require(children.length == 5)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "gcells_cover"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else GeoOps.coverArray(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double], vs(4).asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** geom_cover(geom, res) -> array<long>: cells covering the geometry's
  * bbox at `res`, computed in one codegen'd pass over the point structs
  * (see GeoOps.geomCoverArray for the expressions it replaces). */
case class GeomCover(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "geom_cover"
  override protected def nullSafeEval(g: Any, r: Any): Any =
    GeoOps.geomCoverArray(g.asInstanceOf[ArrayData], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, r) => {
      s"""${ev.value} = graft.functions.GeoOps.geomCoverArray($g, $r);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** polyline_project(pLat, pLon, glat, glon) ->
  * struct<_1: progr, _2: lat, _3: lon, _4: distM> — the candidate join's
  * inner kernel as a codegen'd expression (was a ScalaUDF whose Seq[Double]
  * conversion boxed every coordinate and allocated a tuple per point). */
case class PolylineProject(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("_1", DoubleType, nullable = false),
    StructField("_2", DoubleType, nullable = false),
    StructField("_3", DoubleType, nullable = false),
    StructField("_4", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "polyline_project"
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoOps.projectArrays(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.GeoOps.projectArrays($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** cost_to_int(seconds) -> long decisecond fixed point (Geo.costToInt as a
  * codegen'd expression; was a ScalaUDF in the edge-cost projection). */
case class CostToInt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cost_to_int"
  override protected def nullSafeEval(s: Any): Any =
    Geo.costToInt(s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.geo.Geo.costToInt($s)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column-side API + SQL registration. */
object GeoFunctions {
  import org.apache.spark.sql.SparkSession

  def gcell(lat: Column, lon: Column, res: Int): Column =
    ExpressionUtils.column(CellEncode(
      ExpressionUtils.expression(lat), ExpressionUtils.expression(lon),
      Literal(res)))

  def gcellParent(cell: Column, res: Int): Column =
    ExpressionUtils.column(CellParent(ExpressionUtils.expression(cell), Literal(res)))

  def kring(cell: Column, k: Int): Column =
    ExpressionUtils.column(KRing(ExpressionUtils.expression(cell), Literal(k)))

  def kring(cell: Column, k: Column): Column =
    ExpressionUtils.column(KRing(ExpressionUtils.expression(cell), ExpressionUtils.expression(k)))

  def haversineM(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    ExpressionUtils.column(HaversineM(
      ExpressionUtils.expression(lat1), ExpressionUtils.expression(lon1),
      ExpressionUtils.expression(lat2), ExpressionUtils.expression(lon2)))

  def gcellsCover(latMin: Column, lonMin: Column, latMax: Column, lonMax: Column, res: Int): Column =
    ExpressionUtils.column(CellsCover(Seq(
      ExpressionUtils.expression(latMin), ExpressionUtils.expression(lonMin),
      ExpressionUtils.expression(latMax), ExpressionUtils.expression(lonMax),
      Literal(res))))

  def geomCover(geom: Column, res: Int): Column =
    ExpressionUtils.column(GeomCover(ExpressionUtils.expression(geom), Literal(res)))

  def polylineProject(pLat: Column, pLon: Column, glat: Column, glon: Column): Column =
    ExpressionUtils.column(PolylineProject(
      ExpressionUtils.expression(pLat), ExpressionUtils.expression(pLon),
      ExpressionUtils.expression(glat), ExpressionUtils.expression(glon)))

  def costToInt(seconds: Column): Column =
    ExpressionUtils.column(CostToInt(ExpressionUtils.expression(seconds)))

  /** Register SQL names so spark.sql("... gcell(lat,lon,12) ...") works. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("gcell", es => CellEncode(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("gcell_parent", es => CellParent(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("kring", es => KRing(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("haversine_m", es => HaversineM(es(0), es(1), es(2), es(3)), "scala_udf")
    reg.createOrReplaceTempFunction("gcells_cover", es => CellsCover(es), "scala_udf")
  }
}
