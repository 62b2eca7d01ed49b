package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness (r18, VERDICT r17 #5): scaling points for
  * one representative per r17-optimized headline family, so the
  * "100 TB-safe" claims behind the native-expression rework are
  * measured numbers rather than arguments (the SelectionScaleTime
  * convention — id-offset replicas reuse the SAME texts/vectors, so
  * dictionary/codebook artifacts stay CONSTANT while the data stream
  * grows n×):
  *  - unigram_encode: trainer + Viterbi encode are native expressions
  *    carrying the cost map as a reference object → plan size constant
  *    in corpus size, wall should track the encode stream (~linear).
  *  - knn_ivf_pq_residual_opq_learned: rotation/coarse/PQ training
  *    scans grow n×, every artifact stays k·d-bounded, search is the
  *    literal-codebook scan → ~linear.
  *  - contamination_matrix: gram explode + capped semi-joins → ~linear.
  * Run: sbt "Test/runMain graft.FamilyScaleTime"
  */
object FamilyScaleTime {
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        System.gc()
      }
    time("unigram_encode        1x (5k docs)") {
      noop(graft.operators.UnigramLm.encode(d1))
    }
    time("unigram_encode        8x (40k docs)") {
      noop(graft.operators.UnigramLm.encode(docReplica(8)))
    }
    time("unigram_encode       64x (320k docs)") {
      noop(graft.operators.UnigramLm.encode(docReplica(64)))
    }
    time("knn_ivfpq_res_opq     1x (2k vecs)") {
      noop(graft.operators.Similarity.knnIvfPqResidualOpqLearned(e1))
    }
    time("knn_ivfpq_res_opq     8x (16k vecs)") {
      noop(graft.operators.Similarity.knnIvfPqResidualOpqLearned(embReplica(8)))
    }
    time("knn_ivfpq_res_opq    64x (128k vecs)") {
      noop(graft.operators.Similarity.knnIvfPqResidualOpqLearned(embReplica(64)))
    }
    time("contamination_matrix  1x (5k docs)") {
      noop(graft.operators.TextOps.contaminationMatrix(d1))
    }
    time("contamination_matrix  8x (40k docs)") {
      noop(graft.operators.TextOps.contaminationMatrix(docReplica(8)))
    }
    time("contamination_matrix 64x (320k docs)") {
      noop(graft.operators.TextOps.contaminationMatrix(docReplica(64)))
    }
    spark.stop()
  }
}
