package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness: unigram-LM trainer scaling points (r13).
  * Two claims get numbers here instead of assertions:
  *
  * 1. BOTH E-steps are dictionary-scale. On a replicated corpus (same
  *    words, k× the rows) the EM rounds run over the identical
  *    dictionary, so hard-EM (Viterbi) and soft-EM (forward–backward)
  *    training should stay ~flat while only the one corpus-scale
  *    wordCounts scan grows. The soft E-step's α/β lattice folds do
  *    ~4× the per-word arithmetic of the Viterbi argmin plus a wider
  *    occurrence explode — this measures what that factor really is.
  *
  * 2. The pre-trained apply split pays. encode() retrains per call
  *    (seed scan + EM rounds + usage collects); encodeWith() is the
  *    apply-only plan over a shipped artifact. The delta IS the
  *    train-once/encode-forever saving a dataloader banks per epoch.
  *
  * Run: sbt "Test/runMain graft.UnigramScaleTime"
  */
object UnigramScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs1 = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    def replica(k: Int) = (0 until k).map(i =>
        docs1.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)

    def timeIt(tag: String)(f: => Unit): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    // the apply split FIRST, before the replica section dirties the
    // JVM (a first draft ran it last and measured encode at 18 s —
    // positional contamination from the 64x blocks, not the plan: a
    // fresh-JVM control decomposed encode exactly into train + apply)
    val pieces = graft.operators.UnigramLm.train(docs1)
    timeIt("encode 1x (retrains per call)") {
      graft.operators.UnigramLm.encode(docs1)
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("encodeWith 1x (apply-only, shipped artifact)") {
      graft.operators.UnigramLm.encodeWith(docs1, pieces)
        .write.format("noop").mode("overwrite").save()
    }
    for (k <- Seq(1, 8, 64)) {
      val d = if (k == 1) docs1 else replica(k)
      timeIt(s"train hard-EM ${k}x (scan + 2 Viterbi rounds + prune + re-est)") {
        assert(graft.operators.UnigramLm.train(d).nonEmpty)
      }
      timeIt(s"train soft-EM ${k}x (scan + 2 FB rounds + prune + re-est)") {
        assert(graft.operators.UnigramLm.train(d, softEm = true).nonEmpty)
      }
    }
    spark.stop()
  }
}
