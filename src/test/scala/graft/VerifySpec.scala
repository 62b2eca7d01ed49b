package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.lit
import java.nio.file.{Files, Paths}

/** Kill-resistance of the correctness dump (r13 VERDICT #1): the
  * driver's round-13 Verify run was killed mid-dump and — because
  * oracle_sql.json used to be written only after all ~237 parquet
  * dumps — the round's entire oracle set zeroed to `{}`. The dump is
  * now oracle-set-FIRST with per-query progress and a per-query wall
  * cap; these specs pin each property by simulating the failure modes
  * (a kill before any dump; a hung query mid-run).
  */
class VerifySpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"verify_spec_$tag").toString

  test("a run killed before ANY parquet dump still leaves the full, " +
    "valid oracle set on disk") {
    val out = tmpDir("oracle_first")
    // the subset spans a plain oracle AND every trained-dictionary
    // placeholder family (BPE, unigram, soft-unigram) — resolving them
    // up front is exactly what the oracle-first ordering pays for
    val keep = Set("q1_pricing_summary", "bpe_token_counts",
      "unigram_encode", "unigram_encode_pretrained_soft")
    // main() calls writeOracleJson BEFORE dumpQueries; calling only
    // the first half IS the simulated mid-run kill: zero dumps happened
    Verify.writeOracleJson(spark, sf, out, keep)
    val json = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    // a REAL json parse (the driver does json.load) — not a substring
    // check: a truncated or mis-escaped dump must fail here
    import spark.implicits._
    val parsed = spark.read.option("multiLine", true)
      .json(Seq(json).toDS).collect()
    assert(parsed.length == 1)
    val cols = spark.read.option("multiLine", true)
      .json(Seq(json).toDS).columns.toSet
    assert(keep.subsetOf(cols), s"missing oracle keys: ${keep -- cols}")
    // every placeholder resolved — a surviving sentinel means the
    // dumped SQL is not self-contained for the DuckDB gate
    Seq(SparkEntry.BpeDictPlaceholder, SparkEntry.UnigramDictPlaceholder,
      SparkEntry.UnigramSoftDictPlaceholder,
      SparkEntry.OpqLearnedRotPlaceholder).foreach(ph =>
      assert(!json.contains(ph), s"unresolved placeholder $ph"))
  }

  test("a hung query is wall-capped and the queries after it still dump") {
    val out = tmpDir("cap")
    import spark.implicits._
    // aa_hang sorts FIRST so the cap is what lets zz_fast run at all
    val injected = Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame](
      "aa_hang" -> ((s, _) => { Thread.sleep(5000); s.range(1).toDF() }),
      "zz_fast" -> ((_, _) => Seq((1L, "ok")).toDF("id", "v")
        .withColumn("tag", lit("fast"))))
    val t0 = System.nanoTime()
    Verify.dumpQueries(spark, sf, out, _ => true, capSec = 1L,
      queries = injected)
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(Files.exists(Paths.get(s"$out/zz_fast")),
      "query after the hung one did not dump")
    val got = spark.read.parquet(s"$out/zz_fast").collect()
    assert(got.length == 1 && got(0).getString(2) == "fast")
    // the hang was capped at ~1 s, not waited out (5 s) per query
    assert(wallSec < 30.0, s"dump took ${wallSec}s — cap did not engage")
  }

  test("a timed-out query's dump dir is purged — even when the zombie " +
    "future finishes its write AFTER the cancel (r14 ADVICE)") {
    val out = tmpDir("purge")
    import spark.implicits._
    // aa_hang stalls in DRIVER-side code (Thread.sleep — the mode
    // cancelJobGroup cannot reach: no jobs submitted yet), then writes
    // a perfectly well-formed parquet AFTER the timeout fired. Without
    // the poisoned-flag purge this truncated-looking-but-valid dump
    // would sit where the DuckDB compare picks it up.
    val injected = Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame](
      "aa_hang" -> ((s, _) => { Thread.sleep(3000); s.range(5).toDF() }),
      "zz_fast" -> ((_, _) => Seq((1L, "ok")).toDF("id", "v")))
    Verify.dumpQueries(spark, sf, out, _ => true, capSec = 1L,
      queries = injected)
    assert(Files.exists(Paths.get(s"$out/zz_fast")))
    // the zombie may still be mid-write when dumpQueries returns; its
    // finally block purges whatever it wrote — poll until it has
    val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
    while (Files.exists(Paths.get(s"$out/aa_hang")) &&
      System.nanoTime() < deadline) Thread.sleep(200)
    assert(!Files.exists(Paths.get(s"$out/aa_hang")),
      "timed-out query left a (misleading) dump on disk")
  }

  test("a subset dump leaves exactly the killed-run artifact shape: " +
    "valid oracle set + the dumped subset") {
    val out = tmpDir("subset")
    val keep = Set("dim_date", "validate_nulls")
    Verify.writeOracleJson(spark, sf, out, keep)
    // dump only ONE of the two — the on-disk state a mid-run kill
    // leaves behind; both the oracle set and the partial dump must be
    // independently usable
    Verify.dumpQueries(spark, sf, out, _ == "dim_date", capSec = 600L)
    assert(Files.exists(Paths.get(s"$out/oracle_sql.json")))
    assert(Files.exists(Paths.get(s"$out/dim_date")))
    assert(!Files.exists(Paths.get(s"$out/validate_nulls")))
    assert(spark.read.parquet(s"$out/dim_date").count() > 0)
    val json = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    import spark.implicits._
    val cols = spark.read.option("multiLine", true)
      .json(Seq(json).toDS).columns.toSet
    assert(keep.subsetOf(cols))
  }
}
