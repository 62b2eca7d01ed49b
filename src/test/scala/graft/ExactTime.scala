package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness: Dedup.exact's two-scan fingerprint pipeline
  * vs an eagerly-checkpointed fps (the decontaminate pattern). Run:
  * sbt "Test/runMain graft.ExactTime"
  */
object ExactTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
        System.gc()
      }
    }
    time("current (2-scan)") { graft.operators.Dedup.exact(docs).count() }
    time("checkpointed fps") {
      val fps = docs.select(col("doc_id"),
        graft.operators.Dedup.fingerprint.as("fp_md5"))
        .localCheckpoint(true)
      val canon = fps.groupBy("fp_md5").agg(min(col("doc_id")).as("canonical_id"))
      val n = fps.join(canon, Seq("fp_md5"))
        .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
        .select("doc_id", "fp_md5", "canonical_id", "is_dup")
        .orderBy("doc_id").count()
      n
    }
    spark.stop()
  }
}
