package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Loader

/** Randomized invariants for the merge semantics (ScalaCheck over
  * small generated tables — the properties a warehouse merge must hold
  * on EVERY input, not just the fixtures).
  */
class MergePropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Long, String)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(1L, 8L)      // few keys → guaranteed collisions
      v <- Gen.choose(1L, 5L)
      p <- Gen.oneOf("a", "b", "c")
    } yield (k, v, p))

  private def run(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(25).withInitialSeed(42L), p)
    assert(res.passed, res.status.toString)
  }

  test("upsertKeepLatest: one row per key, max order wins, idempotent") {
    run(Prop.forAll(rowsGen, rowsGen) { (ex, in) =>
      (ex.nonEmpty && in.nonEmpty) ==> {
        val exDf = ex.toDF("k", "ver", "payload")
        val inDf = in.toDF("k", "ver", "payload")
        val merged = Loader.upsertKeepLatest(exDf, inDf, Seq("k"), "ver")
        val rows = merged.collect().map(r => (r.getLong(0), r.getLong(1))).toList
        val oneRowPerKey = rows.map(_._1).distinct.size == rows.size
        // winner carries the max order value of that key across both sides
        val expectMax = (ex ++ in).groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        val maxWins = rows.forall { case (k, v) => v == expectMax(k) }
        // re-merging the merged result with the same incoming changes nothing
        val again = Loader.upsertKeepLatest(merged, inDf, Seq("k"), "ver")
        val idempotent = again.exceptAll(merged).isEmpty && merged.exceptAll(again).isEmpty
        oneRowPerKey && maxWins && idempotent
      }
    })
  }

  test("scd2Merge: at most one current version per key; updates never lose keys") {
    val asOf = java.sql.Date.valueOf("2024-06-01")
    // null is a legitimate attribute value — the presence-flag/null-safe
    // merge must treat it like any other (the old first-attr-isNull
    // sentinel silently dropped such updates)
    val histGen = Gen.listOfN(6, for {
      k <- Gen.choose(1L, 4L)
      p <- Gen.oneOf("a", "b", "c", null.asInstanceOf[String])
    } yield (k, p))
    run(Prop.forAll(histGen, histGen) { (hs, us) =>
      (hs.nonEmpty && us.nonEmpty) ==> {
        val hist = hs.map(_._1).distinct.map { k =>
          (k, hs.find(_._1 == k).get._2,
            java.sql.Date.valueOf("2024-01-01"), null: java.sql.Date, true)
        }.toDF("k", "attr", "valid_from", "valid_to", "is_current")
        val upd = us.distinctBy(_._1).toDF("k", "attr")
        val merged = Loader.scd2Merge(hist, upd, "k", Seq("attr"), asOf)
        val current = merged.filter(col("is_current")).collect()
          .map(r => (r.getLong(0), r.getString(1)))
        val onePerKey = current.map(_._1).distinct.length == current.length
        // every key present before or in the update has exactly one current row
        val expectedKeys = (hs.map(_._1) ++ us.map(_._1)).distinct.sorted
        val keysKept = current.map(_._1).distinct.sorted.sameElements(expectedKeys)
        // a current row's attr equals the update's attr when the key was updated
        val updMap = us.distinctBy(_._1).toMap
        val attrsRight = current.forall { case (k, a) => updMap.get(k).forall(_ == a) }
        onePerKey && keysKept && attrsRight
      }
    })
  }
}
