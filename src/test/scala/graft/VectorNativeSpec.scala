package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.functions.VectorDpExpressions

/** r17 optimization: the ANN vector primitives moved from declarative
  * HOF folds to native expressions (VectorDpExpressions). Pins the
  * native forms BIT-EQUAL to the declarative references on float and
  * double arrays, including the length-mismatch null and the
  * rotation's dimension contract.
  */
class VectorNativeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val fvecs: Seq[(Long, Seq[Float])] = (0L until 6L).map { i =>
    i -> (0 until 8).map(j => ((i * 31 + j * 17 % 13) - 6).toFloat / 7f)
  }
  private val code: Seq[Seq[Double]] = (0 until 3).map { c =>
    (0 until 8).map(j => (c * 13 + j * 7 % 11 - 5).toDouble / 9.0)
  }

  test("SqDist bit-equals the declarative fold (float x double-literal)") {
    val df = fvecs.toDF("vec_id", "v")
    val cl = typedLit(code.head)
    val native = df.select(VectorDpExpressions.sqDist(col("v"), cl)).collect().map(_.getDouble(0))
    val decl = df.select(Similarity.sqDistDeclarative(col("v"), cl)).collect().map(_.getDouble(0))
    assert(native.toSeq == decl.toSeq)
  }

  test("SqDist null on length mismatch, like zip_with padding") {
    val df = Seq(Seq(1.0f, 2.0f)).toDF("v")
    val short = typedLit(Seq(1.0))
    assert(df.select(VectorDpExpressions.sqDist(col("v"), short)).collect()(0).isNullAt(0))
    assert(df.select(Similarity.sqDistDeclarative(col("v"), short)).collect()(0).isNullAt(0))
  }

  test("DistancesTo bit-equals per-centroid declarative folds") {
    val df = fvecs.toDF("vec_id", "v")
    val native = df.select(VectorDpExpressions.distancesTo(col("v"), code).as("d"))
      .collect().map(_.getSeq[Double](0))
    val decl = df.select(array(code.map(c =>
        Similarity.sqDistDeclarative(col("v"), typedLit(c))): _*).as("d"))
      .collect().map(_.getSeq[Double](0))
    assert(native.toSeq == decl.toSeq)
  }

  test("CosinesTo bit-equals per-centroid declarative cosine folds (r18)") {
    val df = fvecs.toDF("vec_id", "v")
    val native = df.select(VectorDpExpressions.cosinesTo(col("v"), code).as("c"))
      .collect().map(_.getSeq[Double](0))
    val decl = df.select(array(code.map(c =>
        Similarity.cosToCentroidDeclarative(col("v"), typedLit(c))): _*).as("c"))
      .collect().map(_.getSeq[Double](0))
    assert(native.toSeq == decl.toSeq)
    // double input path too
    val dd = fvecs.map { case (i, v) => (i, v.map(_.toDouble)) }.toDF("vec_id", "v")
    val nd = dd.select(VectorDpExpressions.cosinesTo(col("v"), code).as("c"))
      .collect().map(_.getSeq[Double](0))
    val dd2 = dd.select(array(code.map(c =>
        Similarity.cosToCentroidDeclarative(col("v"), typedLit(c))): _*).as("c"))
      .collect().map(_.getSeq[Double](0))
    assert(nd.toSeq == dd2.toSeq)
  }

  test("CosinesTo yields a null element on length mismatch, like the declarative transform") {
    val df = Seq(Seq(1.0f, 2.0f)).toDF("v")
    val mixed = Seq(Seq(1.0, 2.0), Seq(1.0)) // second centroid mismatched
    val got = df.select(VectorDpExpressions.cosinesTo(col("v"), mixed).as("c"))
      .collect()(0).getSeq[java.lang.Double](0)
    assert(got(0) != null && got(1) == null)
  }

  test("CosineSimAny bit-equals the declarative cosToCentroid folds") {
    val df = fvecs.toDF("vec_id", "v")
    val cl = typedLit(code.head)
    val native = df.select(VectorDpExpressions.cosineAny(col("v"), cl)).collect().map(_.getDouble(0))
    val decl = df.select(Similarity.cosToCentroidDeclarative(col("v"), cl)).collect().map(_.getDouble(0))
    assert(native.toSeq == decl.toSeq)
  }

  test("MatVecFloat bit-equals the declarative rotation columns") {
    val dim = 8
    val rows: IndexedSeq[IndexedSeq[Double]] = (0 until dim).map { i =>
      (0 until dim).map(j => ((i * 5 + j * 3) % 7 - 3).toDouble / 4.0)
    }
    val df = fvecs.toDF("vec_id", "v")
    val declCols = (0 until dim).map { i =>
      val coef = typedLit(rows(i).toSeq)
      aggregate(graft.functions.ColUtil.posRange(lit(dim)), lit(0.0),
        (acc, p) => acc + element_at(col("v"), p).cast("double") * element_at(coef, p))
        .cast("float")
    }
    val native = df.select(VectorDpExpressions.matVecFloat(col("v"), rows.map(_.toSeq)).as("y"))
      .collect().map(_.getSeq[Float](0))
    val decl = df.select(array(declCols: _*).as("y"))
      .collect().map(_.getSeq[Float](0))
    assert(native.toSeq == decl.toSeq)
  }

  test("MatVecFloat enforces the dimension contract with the named message") {
    val df = Seq(Seq(1.0f, 2.0f)).toDF("v")
    val rows = (0 until 8).map(_ => (0 until 8).map(_ => 1.0).toSeq).toSeq
    val e = intercept[Exception] {
      df.select(VectorDpExpressions.matVecFloat(col("v"), rows)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains(
      "embedding dimension must be exactly 8, got 2")))
  }

  test("CovTermsNative bit-equals the declarative covarianceTerms fan-out") {
    val df = fvecs.toDF("vec_id", "embedding")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("di", "dj").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val native = rows(Similarity.covarianceTerms(df)
      .select(col("di"), col("dj"), col("s"), col("n")))
    val decl = rows(Similarity.covarianceTermsDeclarative(df)
      .select(col("di"), col("dj"), col("s"), col("n")))
    assert(native == decl)
    assert(native.nonEmpty)
    // negative values exercise the HALF_UP (away-from-zero) rounding
    val neg = Seq((0L, Seq(-0.5f, 0.25f, -0.75f)),
      (1L, Seq(0.125f, -0.375f, 0.5f))).toDF("vec_id", "embedding")
    val nn = rows(Similarity.covarianceTerms(neg)
      .select(col("di"), col("dj"), col("s"), col("n")))
    val nd = rows(Similarity.covarianceTermsDeclarative(neg)
      .select(col("di"), col("dj"), col("s"), col("n")))
    assert(nn == nd)
    assert(nn.exists(_._3 < 0))
  }

  test("LshBits bit-equals the declarative lshSignature") {
    val dim = 64
    val vecs = (0L until 8L).map { i =>
      i -> (0 until dim).map(j =>
        (((i * 37 + j * 11) % 19).toFloat - 9f) / 5f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val native = df.select(Similarity.lshSignature(col("embedding"))).collect().map(_.getString(0))
    val decl = df.select(Similarity.lshSignatureDeclarative(col("embedding"))).collect().map(_.getString(0))
    assert(native.toSeq == decl.toSeq)
    assert(native.exists(_.contains("1")))
    // mismatched dimension: the declarative null-propagation yields all zeros
    val short = Seq(Seq(1.0f, 2.0f)).toDF("embedding")
    val nm = short.select(Similarity.lshSignature(col("embedding"))).collect()(0).getString(0)
    val dm = short.select(Similarity.lshSignatureDeclarative(col("embedding"))).collect()(0).getString(0)
    assert(nm == dm && nm == "00000000")
  }
}
