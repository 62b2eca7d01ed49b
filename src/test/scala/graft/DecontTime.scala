package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing harness: current decontaminate vs hot-list anti-join
  * variant at sf0.1. Run: sbt "Test/runMain graft.DecontTime"
  */
object DecontTime {
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
      }
    }
    time("current") { graft.operators.TextOps.decontaminate(docs).count() }
    time("variant") { graft.operators.TextOps.decontaminateV2(docs).count() }
    spark.stop()
  }
}
