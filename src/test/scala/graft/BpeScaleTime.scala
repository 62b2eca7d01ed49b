package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness: BPE trainer scaling points (r7.4). The
  * trainer's 100 TB claim is that the corpus is touched ONCE
  * (wordCounts) and every merge round costs VOCABULARY scale — so on a
  * replicated corpus (same words, k× the rows) the scan should grow
  * ~linearly while the merge rounds stay flat (the dictionary is
  * identical). This measures both halves separately so the claim is a
  * number, not an assertion.
  * Run: sbt "Test/runMain graft.BpeScaleTime"
  */
object BpeScaleTime {
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
    for (k <- Seq(1, 8, 64)) {
      val d = if (k == 1) docs1 else replica(k)
      timeIt(s"wordCounts ${k}x (the one corpus-scale stage)") {
        graft.operators.Bpe.wordCounts(d)
          .write.format("noop").mode("overwrite").save()
      }
      timeIt(s"train-16-merges ${k}x (scan + 16 vocab-scale rounds)") {
        val (m, words) = graft.operators.Bpe.train(d, nMerges = 16)
        org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(words)
        assert(m.size == 16)
      }
    }
    spark.stop()
  }
}
