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
