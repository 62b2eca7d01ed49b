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


  /** Per-centroid [[cosineAny]] fold vector under a literal codebook —
    * the cosine twin of [[distancesTo]] (r18, VERDICT r17 #8: the
    * remaining ivfSearch/annOperatingCurve transform-over-codebook
    * tree). Null element on length mismatch, matching the declarative
    * transform(cents, c -> cosine(v, c)).
    */
  def cosinesTo(v: ArrayData, cents: Array[Array[Double]],
                vF: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length != n) out(c) = null
      else {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = get(v, i, vF); val y = cent(i)
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        out(c) = dot / (math.sqrt(na) * math.sqrt(nb))
      }
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Spark Round(HALF_UP, scale 0) on a double, then the double→long
    * cast — the covarianceTerms nano-quantization, bit-exact.
    */
  @inline private def roundToLong(x: Double): Long = {
    val r = if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
      else java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    r.toLong
  }

  /** The covariance term fan-out — first the d linear terms
    * (di, −1, round(vᵢ·1e9)), then the upper-triangle second moments
    * (di, dj, round(vᵢ·vⱼ·1e9)) in (i, j≥i) order, exactly the
    * declarative concat(lin, pairs) layout.
    */
  def covTerms(v: ArrayData, vF: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n + n * (n + 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val xi = get(v, i, vF)
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](i.toLong, -1L, roundToLong(xi * 1e9)))
      k += 1
      i += 1
    }
    i = 0
    while (i < n) {
      val xi = get(v, i, vF)
      var j = i
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i.toLong, j.toLong, roundToLong(xi * get(v, j, vF) * 1e9)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane signature bits — per plane the ordered signed
    * fold, '1' iff strictly positive; a length-mismatched vector
    * yields the declarative form's all-'0' null-propagation result.
    */
  def lshBits(v: ArrayData, planes: Array[Array[Double]],
              vF: Boolean): org.apache.spark.unsafe.types.UTF8String = {
    val chars = new Array[Byte](planes.length)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      if (v.numElements() != plane.length) chars(p) = '0'
      else {
        var acc = 0.0
        var i = 0
        while (i < plane.length) { acc += get(v, i, vF) * plane(i); i += 1 }
        chars(p) = if (acc > 0.0) '1' else '0'
      }
      p += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(chars)
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

case class CosinesTo(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression with ArrayElemTypes {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "cosines_to"
  @transient private lazy val vF = elemIsFloat(child)
  @transient private lazy val table: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    VecDpHelper.cosinesTo(v.asInstanceOf[ArrayData], table, vF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("cents", table, "double[][]")
      s"${ev.value} = graft.functions.VecDpHelper.cosinesTo($v, $ref, $vF);"
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


case class CovTermsNative(child: Expression)
    extends UnaryExpression with ArrayElemTypes {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("di", LongType, nullable = false),
      StructField("dj", LongType, nullable = false),
      StructField("t", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cov_terms"
  @transient private lazy val vF = elemIsFloat(child)

  override def nullSafeEval(v: Any): Any =
    VecDpHelper.covTerms(v.asInstanceOf[ArrayData], vF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VecDpHelper.covTerms($v, $vF);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class LshBits(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with ArrayElemTypes {
  override def dataType: DataType = StringType
  override def prettyName: String = "lsh_bits"
  @transient private lazy val vF = elemIsFloat(child)
  @transient private lazy val table: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    VecDpHelper.lshBits(v.asInstanceOf[ArrayData], table, vF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("planes", table, "double[][]")
      s"${ev.value} = graft.functions.VecDpHelper.lshBits($v, $ref, $vF);"
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

  def cosinesTo(v: Column, cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(CosinesTo(ColumnBridge.expression(v), cents))

  def matVecFloat(v: Column, rows: Seq[Seq[Double]]): Column =
    ColumnBridge.column(MatVecFloat(ColumnBridge.expression(v), rows))

  def covTerms(v: Column): Column =
    ColumnBridge.column(CovTermsNative(ColumnBridge.expression(v)))

  def lshBits(v: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(LshBits(ColumnBridge.expression(v), planes))

}
