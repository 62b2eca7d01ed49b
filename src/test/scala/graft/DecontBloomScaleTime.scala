package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness: the decontaminate-vs-bloom crossover
  * (r7.2). The bloom variant's claim is the train≫eval shape: its
  * build cost is eval-sized while its saving grows with the train
  * side. At the fixture's natural 80/20 split the bloom measured
  * ~0.7 s SLOWER at sf0.1, so this harness constructs the claimed
  * shape and measures it: the TRAIN side is grown ~6.4× by id-offset
  * replicas filtered to train-split buckets (the md5 split rule,
  * restated inline), while the EVAL side stays the original — then
  * times both operators on the same corpus.
  * Run: sbt "Test/runMain graft.DecontBloomScaleTime"
  */
object DecontBloomScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    // the operators' split rule (TextOps.splitBucket / the oracle's b):
    // train = buckets 0..7 of md5("split:" + doc_id) % 10
    def bucket = conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10
    // replicas of TRAIN-side texts, kept only when the NEW id also
    // lands in a train bucket — eval grams stay exactly the originals
    val replicas = (1 to 8).map(k =>
        docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _)
      .filter(bucket < 8)
    val grown = docs.unionByName(replicas)
    println(s"corpus: ${docs.count()} docs -> ${grown.count()} " +
      "(train side ~6.4x, eval side unchanged)")
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f.count()
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
        System.gc()   // release the ops' localCheckpoint blocks
      }
    }
    time("decontaminate      1x") { graft.operators.TextOps.decontaminate(docs) }
    time("decontaminate_bloom 1x") { graft.operators.TextOps.decontaminateBloom(docs) }
    time("decontaminate      6x-train") { graft.operators.TextOps.decontaminate(grown) }
    time("decontaminate_bloom 6x-train") { graft.operators.TextOps.decontaminateBloom(grown) }
    spark.stop()
  }
}
