package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness: scaling points for the r16 selection/dedup
  * families, so their scale claims are measured numbers (the
  * BigramScaleTime convention — id-offset replicas reuse the SAME
  * texts/vectors, so model/dictionary tables stay CONSTANT while the
  * probe streams grow n×):
  *  - dsirWeights: token-scale feature map + ≤B-row broadcast models
  *    → wall should track the feature stream (~linear).
  *  - trigramBackoff: probe stream grows n×, the distinct-trigram
  *    contribution table stays constant → ~linear.
  *  - semdedup: replicas are DELIBERATELY adversarial — every replica
  *    of a vector is its exact near-dup, so components grow n-wide —
  *    AND the 8× point exercises the documented scale knob: k is
  *    raised 8× so cell populations (~n/k) stay constant and the
  *    in-cell pair join stays linear in the corpus; the same point at
  *    FIXED k=8 is also measured once to show the quadratic cost the
  *    knob exists to avoid (the scaladoc's claim, as a number).
  * Run: sbt "Test/runMain graft.SelectionScaleTime"
  */
object SelectionScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d1 = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val e1 = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
    def docReplica(n: Int) = (0 until n).map(i =>
        d1.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    def embReplica(n: Int) = (0 until n).map(i =>
        e1.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    def time(tag: String)(f: => Unit): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        System.gc()
      }
    val tgt = col("lang") === "en"
    time("dsirWeights     1x (5k docs)") {
      graft.operators.Corpus.dsirWeights(d1, tgt).count(); ()
    }
    time("dsirWeights     8x (40k docs)") {
      graft.operators.Corpus.dsirWeights(docReplica(8), tgt).count(); ()
    }
    time("dsirWeights    64x (320k docs)") {
      graft.operators.Corpus.dsirWeights(docReplica(64), tgt).count(); ()
    }
    def split(df: org.apache.spark.sql.DataFrame) =
      (df.filter(col("doc_id") % 2 =!= 0), df.filter(col("doc_id") % 2 === 0))
    time("trigramBackoff  1x (5k docs)") {
      val (b, s) = split(d1)
      graft.operators.TextOps.trigramBackoff(b, s).count(); ()
    }
    time("trigramBackoff  8x (40k docs)") {
      val (b, s) = split(docReplica(8))
      graft.operators.TextOps.trigramBackoff(b, s).count(); ()
    }
    time("trigramBackoff 64x (320k docs)") {
      val (b, s) = split(docReplica(64))
      graft.operators.TextOps.trigramBackoff(b, s).count(); ()
    }
    time("semdedup        1x (5k vecs, k=8)") {
      graft.operators.Similarity.semdedup(e1).count(); ()
    }
    time("semdedup        8x (40k vecs 8-way duplicated, k=64 — the scale knob)") {
      graft.operators.Similarity.semdedup(embReplica(8), k = 64).count(); ()
    }
    // the anti-measurement: the same corpus at FIXED k — cell
    // populations 8×, in-cell pairs 64× — one rep, to show the cost
    // the knob avoids
    val t0 = System.nanoTime()
    graft.operators.Similarity.semdedup(embReplica(8), k = 8).count()
    println(f"semdedup        8x at FIXED k=8 (quadratic cells) run1: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
