package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness for the ExactSubstr family's one structural
  * choice: the positional gram stream (token-scale, NOT distinctable —
  * positions are the payload) feeds both the duplicate-set aggregate
  * and the join probe. Checkpoint it once (storage = one 20-byte row
  * per corpus token) or re-derive it per consumer (a second
  * tokenize+md5 scan)? decontaminate measured checkpoint-wins for its
  * DISTINCT gram stream; this harness re-asks the question for the
  * strictly larger positional stream, at 1× and 8× sf0.1.
  *
  * Run: sbt "Test/runMain graft.SpanScaleTime"
  */
object SpanScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")

    // the Bench settle barrier (GC + poll the block census until the
    // ContextCleaner's removal storm stops) — without it a prior rep's
    // token-scale checkpoint blocks get reaped INSIDE the next timed
    // region and read as a 20x outlier
    def census(): Long =
      org.apache.spark.sql.graft.ColumnBridge.numStorageBlocks +
        org.apache.spark.sql.graft.ColumnBridge.numDiskBlocks
    def settle(): Unit = {
      System.gc()
      var prev = -1L; var cur = census(); var polls = 0
      while (cur != prev && polls < 25) {
        Thread.sleep(20); prev = cur; cur = census(); polls += 1
      }
    }
    def time(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        settle()
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }

    time("checkpoint 1x") {
      graft.operators.TextOps.repeatedSpans(docs).count()
    }
    time("rescan     1x") {
      graft.operators.TextOps.repeatedSpansRescan(docs).count()
    }

    // 8× replica corpus: doc_id remapped so replicas are EXACT dups of
    // each other — the worst case for the duplicate-position side
    // (every position duplicated, the island merge sees full-doc runs)
    val docs8 = (0 until 8).map { r =>
      docs.withColumn("doc_id", col("doc_id") * 8 + lit(r))
    }.reduce(_ unionByName _)
    time("checkpoint 8x") {
      graft.operators.TextOps.repeatedSpans(docs8).count()
    }
    time("rescan     8x") {
      graft.operators.TextOps.repeatedSpansRescan(docs8).count()
    }
    spark.stop()
  }
}
