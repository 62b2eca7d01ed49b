package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the ANN family's vector primitives
  * (r17 optimization round — the CosineSim/UnigramExpressions lesson
  * on the remaining HOF hot paths): squared-L2 folds, literal-codebook
  * distance vectors, and the OPQ rotation were zip_with/aggregate/
  * transform trees whose per-call ANALYSIS cost dominated the
  * fixture-scale scans (the rotation alone was 64 fold columns ≈ 16k
  * expression nodes) and whose lambdas evaluate interpreted. Each is
  * now ONE plan node carrying codebooks/rotation rows as reference
  * objects.
  *
  * Exactness: every fold accumulates LEFT-TO-RIGHT in double, exactly
  * the declarative forms' association (spec: VectorNativeSpec pins
  * bit-equality against the HOF forms on float and double inputs,
  * including the length-mismatch null and the rotation's dimension
  * contract), so every downstream nano-quantized Long and tie-break
  * is unchanged.
  */
object VecDpHelper {
  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Ordered Σ(x−y)² fold; null (the zip_with padding semantics) on
    * length mismatch.
    */
  def sqDist(a: ArrayData, b: ArrayData, aF: Boolean,
             bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, i, aF) - get(b, i, bF)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Per-centroid sqDist fold vector under a literal codebook. */
  def distancesTo(v: ArrayData, cents: Array[Array[Double]],
                  vF: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length != n) out(c) = null
      else {
        var acc = 0.0
        var i = 0
        while (i < n) {
          val d = get(v, i, vF) - cent(i)
          acc += d * d
          i += 1
        }
        out(c) = acc
      }
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Ordered cosine fold (dot / (√Σx² · √Σy²)), each accumulator
    * left-to-right — the cosToCentroid association; null on length
    * mismatch (zip_with padding).
    */
  def cosineAny(a: ArrayData, b: ArrayData, aF: Boolean,
                bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, aF); val y = get(b, i, bF)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** y = R·v, each output coordinate an ordered fold, rounded to
    * float — the opqRotateRows map with its hard dimension contract.
    */
  def matVecFloat(v: ArrayData, rows: Array[Array[Double]],
                  vF: Boolean): ArrayData = {
    val dim = rows.length
    if (v.numElements() != dim)
      throw new RuntimeException(
        s"opqRotateRows: embedding dimension must be exactly $dim, got " +
          v.numElements())
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      val coef = rows(i)
      var acc = 0.0
      var p = 0
      while (p < dim) { acc += get(v, p, vF) * coef(p); p += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait ArrayElemTypes { self: Expression =>
  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"${self.prettyName}: expected array<float|double>, got $t")
  }
}

case class SqDistNative(left: Expression, right: Expression)
    extends BinaryExpression with ArrayElemTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist"
  @transient private lazy val lF = elemIsFloat(left)
  @transient private lazy val rF = elemIsFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDpHelper.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lF, rF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
        java.lang.Double r = graft.functions.VecDpHelper.sqDist($a, $b, $lF, $rF);
        if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class CosineSimAny(left: Expression, right: Expression)
    extends BinaryExpression with ArrayElemTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_any"
  @transient private lazy val lF = elemIsFloat(left)
  @transient private lazy val rF = elemIsFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDpHelper.cosineAny(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lF, rF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
        java.lang.Double r = graft.functions.VecDpHelper.cosineAny($a, $b, $lF, $rF);
        if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DistancesTo(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression with ArrayElemTypes {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "distances_to"
  @transient private lazy val vF = elemIsFloat(child)
  @transient private lazy val table: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    VecDpHelper.distancesTo(v.asInstanceOf[ArrayData], table, vF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("cents", table, "double[][]")
      s"${ev.value} = graft.functions.VecDpHelper.distancesTo($v, $ref, $vF);"
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class MatVecFloat(child: Expression, rows: Seq[Seq[Double]])
    extends UnaryExpression with ArrayElemTypes {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "mat_vec_float"
  @transient private lazy val vF = elemIsFloat(child)
  @transient private lazy val table: Array[Array[Double]] =
    rows.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    VecDpHelper.matVecFloat(v.asInstanceOf[ArrayData], table, vF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("rot", table, "double[][]")
      s"${ev.value} = graft.functions.VecDpHelper.matVecFloat($v, $ref, $vF);"
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorDpExpressions {
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(SqDistNative(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def cosineAny(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimAny(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def distancesTo(v: Column, cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(DistancesTo(ColumnBridge.expression(v), cents))

  def matVecFloat(v: Column, rows: Seq[Seq[Double]]): Column =
    ColumnBridge.column(MatVecFloat(ColumnBridge.expression(v), rows))
}
