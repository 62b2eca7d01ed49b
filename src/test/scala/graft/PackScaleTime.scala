package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness: pack-family scaling point (r6). Times
  * packPlan / packSequences on the sf0.1 corpus and an 8× replica
  * corpus (id-offset copies — same language skew), plus the old
  * lang-only-window formulation inline for comparison, so the
  * two-phase scan's claim (parallel WITHIN a language, ~linear wall)
  * is a measured number, not an assertion.
  * Run: sbt "Test/runMain graft.PackScaleTime"
  */
object PackScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs1 = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val docs8 = (0 until 8).map(i =>
        docs1.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    // noop sink, not count(): count() lets the optimizer PRUNE an
    // unconsumed window projection entirely, timing just the scan
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    // the pre-r6 formulation, inline: one window partition per language
    def langOnly(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      df.select(col("doc_id"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
        .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          (col("tokens_before") / 2048).cast("long").as("pack_id"),
          (col("tokens_before") % 2048).as("pack_offset"))
    }
    time("packPlan 1x (two-phase)") { graft.operators.Corpus.packPlan(docs1) }
    time("packPlan 8x (two-phase)") { graft.operators.Corpus.packPlan(docs8) }
    time("packPlan 1x (lang-only)") { langOnly(docs1) }
    time("packPlan 8x (lang-only)") { langOnly(docs8) }
    time("packSequences 1x") { graft.operators.Corpus.packSequences(docs1) }
    time("packSequences 8x") { graft.operators.Corpus.packSequences(docs8) }
    // the crossover point: 400× (2M docs) — per-language cardinality is
    // where the single-task window starts paying for its sequential
    // sort+scan while the two-phase scan keeps every core busy
    val docs400 = docs1.withColumn("r", explode(sequence(lit(0), lit(399))))
      .withColumn("doc_id", col("doc_id") * 1000L + col("r")).drop("r")
    time("packPlan 400x (two-phase)") { graft.operators.Corpus.packPlan(docs400) }
    time("packPlan 400x (lang-only)") { langOnly(docs400) }
    spark.stop()
  }
}
