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

  // queries that may legitimately be empty at sf0.001: candidate pairs
  // on a dup-free corpus, a specific nation pair with no trade in 6k
  // lines, no dormant-rich customers in a 150-customer sample, audio
  // pairs on a corpus with no byte-identical payloads (r15 — the
  // full oracle still hash-checks the empty result)
  private val mayBeEmpty = Set("dedup_minhash_pairs", "knn_lsh",
    "q7_nation_trade", "q22_dormant_rich", "audio_near_dup")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
