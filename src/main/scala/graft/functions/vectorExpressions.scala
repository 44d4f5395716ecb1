package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static vector kernels callable from generated Java (guide §4: eliminate
  * non-codegen expressions in the hot path). The previous formulations used
  * Spark's higher-order functions (`aggregate(zip_with(...))`,
  * `transform`), which are CodegenFallback: every array element went
  * through a boxed lambda-variable eval per plane per row — measured as
  * the dominant cost of every ANN/embedding query. These helpers run the
  * identical floating-point operation sequence (same element order, same
  * cast-to-double-then-multiply-then-accumulate) as tight JVM loops, so
  * results are bit-identical; only the evaluation strategy changes. */
object VecOps {
  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Σ a(i)*b(i), fold order identical to aggregate(zip_with(a, b, *)):
    * null when lengths differ or any element is null (zip_with pads the
    * shorter side with null and `acc + null` poisons the aggregate). */
  def dotOrNull(a: ArrayData, b: ArrayData,
                aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, aFloat) * elem(b, i, bFloat)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** sqrt(Σ v*v), fold order identical to aggregate(transform(a, sq));
    * null when any element is null. */
  def normOrNull(a: ArrayData, aFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = elem(a, i, aFloat)
      acc += v * v
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  /** All nPlanes sign-projection bits in ONE pass over the array. Per
    * plane j the partial sums accumulate in element order — the identical
    * FP sequence as the per-plane aggregate(transform(...)) — so the sign
    * bits (and thus the bucket id) are bit-identical. A null element makes
    * every projection null, and `when(null > 0, bit).otherwise(0)` summed
    * to 0 in the old expression — replicated by returning 0. */
  def lshBucket(a: ArrayData, nPlanes: Int, aFloat: Boolean): Long = {
    val n = a.numElements()
    val acc = new Array[Double](nPlanes)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return 0L
      val v = elem(a, i, aFloat)
      var j = 0
      while (j < nPlanes) {
        acc(j) += v * ((i * 37 + j * 101) % 7 - 3).toDouble
        j += 1
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      if (acc(j) > 0) bucket += 1L << j
      j += 1
    }
    bucket
  }
}

/** vec_dot(a, b) -> double: codegen'd array dot product. */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"
  private def isF(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isF(left), isF(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double ${ev.value}_r = graft.functions.VecOps.dotOrNull(
         |  $a, $b, ${isF(left)}, ${isF(right)});
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec_norm(a) -> double: codegen'd L2 norm. */
case class ArrayNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm"
  private def isF: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(a: Any): Any =
    VecOps.normOrNull(a.asInstanceOf[ArrayData], isF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""java.lang.Double ${ev.value}_r = graft.functions.VecOps.normOrNull($a, $isF);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** vec_lsh_bucket(a) -> long: all sign-projection bits in one array pass.
  * Never null (a null/null-element input is bucket 0, matching the old
  * when-otherwise sum's behavior). */
case class LshBucket(child: Expression, nPlanes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "vec_lsh_bucket"
  private def isF: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else VecOps.lshBucket(v.asInstanceOf[ArrayData], nPlanes, isF)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      long ${ev.value} = ${c.isNull} ? 0L :
        graft.functions.VecOps.lshBucket(${c.value}, $nPlanes, $isF);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
