package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness: covariance/PCA scaling points (r7.5).
  * Times [[graft.operators.Similarity.covariance]] (forced through
  * a count of the finished view) and the full
  * [[graft.operators.Similarity.pcaProject]] chain on the sf0.1
  * embeddings and id-offset replica corpora at 8× and 64×, so the
  * one-scan claim (per-row d(d+3)/2 generated terms, map-side
  * partials shipping ≤2,144 rows per partition, driver state constant
  * at d²) is a measured number, not an assertion. Expected shape:
  * wall ~linear in corpus size, dominated by the generate+partial-agg
  * map stage; the shuffle and driver costs are flat.
  * Run: sbt "Test/runMain graft.CovScaleTime"
  */
object CovScaleTime {
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
        System.gc() // release the per-call term checkpoints
      }
    }
    time("covariance 1x") {
      graft.operators.Similarity.covariance(e1).count(); ()
    }
    time("covariance 8x") {
      graft.operators.Similarity.covariance(replica(8)).count(); ()
    }
    time("covariance 64x") {
      graft.operators.Similarity.covariance(replica(64)).count(); ()
    }
    time("pcaProject 1x") {
      graft.operators.Similarity.pcaProject(e1).count(); ()
    }
    time("pcaProject 8x") {
      graft.operators.Similarity.pcaProject(replica(8)).count(); ()
    }
    spark.stop()
  }
}
