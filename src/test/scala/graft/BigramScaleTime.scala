package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness: bigram-logloss scaling points (r8). Times
  * [[graft.operators.TextOps.bigramLogloss]] on the sf0.1 documents
  * and id-offset replica corpora at 8× and 64×, so the scale claims
  * (one corpus map stage for pairs, Zipf-bounded bigram aggregate
  * with map-side partials, model tables derived from the aggregate —
  * never a corpus rescan, one salted corpus-scale join) are measured
  * numbers. Replicas reuse the SAME texts, so the bigram vocabulary —
  * and with it the contribution table and the checkpointed state —
  * stays CONSTANT while the pair stream grows n×: wall should track
  * the pair stream (~linear, overhead-dominated at fixture scale),
  * with the model stages flat. Run:
  * sbt "Test/runMain graft.BigramScaleTime"
  */
object BigramScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d1 = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    def replica(n: Int) = (0 until n).map(i =>
        d1.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    def time(tag: String)(f: => Unit): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        System.gc() // release the per-call model checkpoints
      }
    time("bigramLogloss  1x (5k docs)") {
      graft.operators.TextOps.bigramLogloss(d1).count(); ()
    }
    time("bigramLogloss  8x (40k docs)") {
      graft.operators.TextOps.bigramLogloss(replica(8)).count(); ()
    }
    time("bigramLogloss 64x (320k docs)") {
      graft.operators.TextOps.bigramLogloss(replica(64)).count(); ()
    }
    spark.stop()
  }
}
