package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared operator runs at sf0.001 and its oracle contract is
  * well-formed (oracle keys ⊆ query keys; every query yields a schema).
  */
class SmokeSpec extends AnyFunSuite {
  import TestSpark._

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // candidate-pair queries may legitimately be empty on a dup-free corpus
  private val mayBeEmpty = Set("dedup_minhash_pairs", "knn_lsh")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
