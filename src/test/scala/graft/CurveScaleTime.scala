package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch timing harness (r14, VERDICT r13 #6): the IVF-PQ curve
  * family became the bench's most expensive entries (3.0–4.4 s at
  * sf0.1), so the shared-candidate claim — curve cost ∝ ONE search
  * at the widest config + metadata-scale grid fan-out, NOT
  * grid × search — is measured here at 8×/64× replica scale, against
  * the naive alternative a user without the curve operator runs
  * (one full index build + search per grid point).
  *
  * Comparisons run EARLY in the main and in a fixed order (the
  * UnigramScaleTime lesson: a timing section placed after a 64×
  * replica loop once measured 18 s for a 3.3 s operation — JVM/
  * positional contamination; two reps per point, min is the read).
  * Run: sbt "Test/runMain graft.CurveScaleTime"
  */
object CurveScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb1 = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
    def replica(k: Int) = (0 until k).map(i =>
        emb1.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)

    def timeIt(tag: String)(f: => Unit): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    for (k <- Seq(1, 8, 64)) {
      val d = if (k == 1) emb1 else replica(k)
      // the sweep: ONE training, ONE widest-config candidate set,
      // grid rows as filters (4 rows out)
      timeIt(s"curve ivf-pq ${k}x (one shared candidate set)") {
        assert(Similarity.annOperatingCurveIvfPq(d).collect().length == 4)
      }
      // the naive alternative: each grid point trains its own index
      // and searches from scratch — what the shared construction saves
      timeIt(s"naive 4-point sweep ${k}x (train+search per config)") {
        Seq(1, 2, 4, 8).foreach { np =>
          Similarity.knnIvfPq(d, probeLists = np)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    // the composed member (rotation training + residual chain on top)
    for (k <- Seq(1, 8)) {
      val d = if (k == 1) emb1 else replica(k)
      timeIt(s"curve composed rotate->residual ${k}x") {
        assert(Similarity.annOperatingCurveIvfPqResidualOpqLearned(d)
          .collect().length == 4)
      }
    }
    spark.stop()
  }
}
