package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness: k-means scaling points (r7.2). Times the
  * Lloyd trainer ([[graft.operators.Similarity.kmeansCodebook]]) on
  * the sf0.1 embeddings and id-offset replica corpora at 8× and 64×,
  * so the broadcast-codebook claim (each iteration = one map scan +
  * a k·d-group aggregate whose map-side partials absorb the corpus;
  * wall ~linear in corpus size, driver state constant at k×d) is a
  * measured number, not an assertion.
  * Run: sbt "Test/runMain graft.KmeansScaleTime"
  */
object KmeansScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e1 = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
    def replica(n: Int) = (0 until n).map(i =>
        e1.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    def time(tag: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    // the trainer's own collects materialize every iteration; nothing
    // further to sink
    time("kmeansCodebook 1x") {
      graft.operators.Similarity.kmeansCodebook(e1); ()
    }
    time("kmeansCodebook 8x") {
      graft.operators.Similarity.kmeansCodebook(replica(8)); ()
    }
    time("kmeansCodebook 64x") {
      graft.operators.Similarity.kmeansCodebook(replica(64)); ()
    }
    spark.stop()
  }
}
