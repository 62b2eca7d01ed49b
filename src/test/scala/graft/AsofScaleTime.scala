package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch timing harness: AsOfJoinExec scaling points (VERDICT r7 #6)
  * — the one custom-plan component that had no measured curve. Two
  * axes over the sf0.1 purchase-events × deduped-orders fixture:
  *
  *  - RUN growth: the left side replicated n× with ONLY event_id
  *    offset, so every user's within-partition run grows n× (the
  *    adversarial axis for a streaming merge — long sorted runs stress
  *    the upstream ExternalSorter/spill path; the merge itself carries
  *    one cursor + one held row regardless of run length);
  *  - KEY growth: BOTH sides replicated with user_id/custkey offsets —
  *    run lengths unchanged, n× distinct keys (the uniform 100 TB
  *    axis: more keys, same per-key work).
  *
  * Expected shape: wall ~linear on both axes. The merge is a single
  * pass per partition (O(nL + nR)); the per-partition sorts Catalyst
  * inserts for requiredChildOrdering are the only superlinear term and
  * stay inside ExternalSorter's spill bounds. Both sides are
  * localCheckpointed before timing so the curve measures the
  * exchange+sort+merge, not the parquet scan or the dedupe window.
  * Run: sbt "Test/runMain graft.AsofScaleTime"
  */
object AsofScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .localCheckpoint(true)
    val ord = graft.operators.EventOps
      .ordersPerCustDate(graft.sources.Tables.orders(spark, sf))
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"))
      .localCheckpoint(true)
    // event_id offsets only: same keys, n×-long per-user runs
    def evRuns(n: Int): DataFrame = (0 until n).map(i =>
        ev.withColumn("event_id", col("event_id") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    // key offsets on both sides: n× keys, unchanged run lengths
    def evKeys(n: Int): DataFrame = (0 until n).map(i =>
        ev.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
          (col("user_id") + lit(i * 10000000L)).as("user_id"), col("ts")))
      .reduce(_ unionByName _)
    def ordKeys(n: Int): DataFrame = (0 until n).map(i =>
        ord.select((col("o_custkey") + lit(i * 10000000L)).as("o_custkey"),
          col("o_orderdate"),
          (col("o_orderkey") + lit(i * 100000000L)).as("o_orderkey"),
          col("o_totalprice")))
      .reduce(_ unionByName _)
    def run(l: DataFrame, r: DataFrame): Long =
      graft.plans.AsOf.join(spark, l, r,
        "user_id", "o_custkey", "ts", "o_orderdate").count()
    def time(tag: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    time("runs  1x (20k left)")(run(evRuns(1), ord))
    time("runs  8x (161k left)")(run(evRuns(8), ord))
    time("runs 64x (1.29M left)")(run(evRuns(64), ord))
    time("keys  8x (161k x 1.2M)")(run(evKeys(8), ordKeys(8)))
    time("keys 64x (1.29M x 9.5M)")(run(evKeys(64), ordKeys(64)))
    spark.stop()
  }
}
