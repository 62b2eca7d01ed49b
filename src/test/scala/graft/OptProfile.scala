package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Scratch stage-level profiler for the optimization rounds: times
  * named sub-stages of the heavy registry entries with the noop sink
  * (guide §1.4) so the per-call cost breaks down into train / search /
  * truth / evaluate. Run: sbt "Test/runMain graft.OptProfile <case>".
  */
object OptProfile {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.load()
    val spark = SparkSession.builder()
      .master(s"local[${cfg.cpus}]")
      .config("spark.sql.shuffle.partitions", cfg.cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = cfg.sfDir
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val emb = Tables(spark, d, "embeddings")
    args.headOption.getOrElse("opq") match {
      case "opq" =>
        // warm
        noop(Similarity.knnBrute(emb))
        (1 to 2).foreach { i =>
          println(s"--- rep $i")
          val art = time("trainIvfPqResidualOpqArtifact") {
            Similarity.trainIvfPqResidualOpqArtifact(emb)
          }
          time("search (knnIvfPqResidualOpqWith)") {
            noop(Similarity.knnIvfPqResidualOpqWith(emb, art))
          }
          time("truth (knnTruthPairs)") {
            noop(Similarity.knnTruthPairs(emb))
          }
          time("full recall entry") {
            noop(SparkEntry.queries("ann_recall_ivf_pq_residual_opq_pretrained")(spark, d))
          }
        }
      case "opqtrain" =>
        noop(Similarity.knnBrute(emb))
        (1 to 2).foreach { i =>
          println(s"--- rep $i")
          val rotation = time("opqLearnedRotationRows") {
            Similarity.opqLearnedRotationRows(emb)
          }
          val rot = time("rotate + checkpoint") {
            Similarity.opqRotateRows(emb,
              rotation.map(_.toIndexedSeq).toIndexedSeq).localCheckpoint(true)
          }
          val coarse = time("kmeansCodebook(rot)") {
            Similarity.kmeansCodebook(rot, 8, 3)
          }
          time("kmeans+pq via train (delta = pq)") {
            Similarity.trainIvfPqResidualOpqArtifact(emb)
          }
        }
      case "graph" =>
        noop(Similarity.knnBrute(emb))
        (1 to 2).foreach { i =>
          println(s"--- rep $i")
          val code = time("kmeansCodebook") {
            Similarity.kmeansCodebook(emb, 8, 3)
          }
          val edges = time("nswEdges build+checkpoint") {
            Similarity.nswEdges(emb, code, 6).localCheckpoint(true)
          }
          time("beam search (knnGraphWithArtifacts)") {
            noop(Similarity.knnGraphWithArtifacts(emb, edges,
              Similarity.nswMedoids(emb, code)))
          }
          time("full knn_graph entry") {
            noop(SparkEntry.queries("knn_graph")(spark, d))
          }
        }
      case "unigram" =>
        val docs = Tables(spark, d, "documents")
        noop(TextOps.textStats(docs))
        (1 to 2).foreach { i =>
          println(s"--- rep $i")
          time("unigram_encode entry") {
            noop(SparkEntry.queries("unigram_encode")(spark, d))
          }
          time("unigram vocab (train only)") {
            noop(UnigramLm.vocab(docs))
          }
          time("seq_pack_unigram entry") {
            noop(SparkEntry.queries("seq_pack_unigram")(spark, d))
          }
        }
      case "unigram2" =>
        val docs = Tables(spark, d, "documents")
        val words = Bpe.wordCounts(docs).localCheckpoint(true)
        println(s"dict rows = ${words.count()}")
        (1 to 2).foreach { i =>
          time(s"vocab train $i") { noop(UnigramLm.vocab(docs)) }
          time(s"vocab soft train $i") { noop(UnigramLm.vocabSoftEm(docs)) }
        }
      case "plantime" =>
        noop(Similarity.knnBrute(emb))
        for (q <- Seq("knn_ivf_pq_residual_opq_learned", "knn_ivf_pq",
            "ann_recall_ivf_pq_residual_opq_pretrained", "knn_graph",
            "semdedup_prune", "knn_ivf_pq_residual")) {
          (1 to 2).foreach { i =>
            val df = time(s"$q build plan $i") {
              val x = SparkEntry.queries(q)(spark, d)
              x.queryExecution.executedPlan // force analysis+optimization
              x
            }
            time(s"$q execute $i") { noop(df) }
          }
        }
      case "semdedup" =>
        import org.apache.spark.sql.functions.col
        noop(Similarity.knnBrute(emb))
        (1 to 2).foreach { i =>
          println(s"--- rep $i")
          val code = time("kmeansCodebook") {
            Similarity.kmeansCodebook(emb, 8, 3)
          }
          time("semdedupWith") {
            noop(Similarity.semdedupWith(emb, code))
          }
          val standing = emb.filter(col("vec_id") % 2 === 0)
          val batch = emb.filter(col("vec_id") % 2 =!= 0)
          val index = time("semdedupIndex(standing)") {
            Similarity.semdedupIndex(standing, code).localCheckpoint(true)
          }
          time("admitWithIndex (collision + internal)") {
            noop(Similarity.semdedupAdmitWithIndex(index, batch, code))
          }
          time("semdedup_admit entry") {
            noop(SparkEntry.queries("semdedup_admit")(spark, d))
          }
        }
      case "truthread" =>
        noop(Similarity.knnBrute(emb))
        noop(SparkEntry.queries("ann_exact_truth")(spark, d))
        for (q <- Seq("ann_recall_ivf", "ann_recall_ivf_pq", "ann_recall")) {
          (1 to 3).foreach { i =>
            val df = time(s"$q fn call (incl. truth read) $i") {
              SparkEntry.queries(q)(spark, d)
            }
            time(s"$q plan+exec $i") { noop(df) }
          }
        }
      case "truthexec" =>
        noop(Similarity.knnBrute(emb))
        noop(SparkEntry.queries("ann_exact_truth")(spark, d))
        val dg = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.substring(0, 8)
        val pth = s"target/graft_truth/$dg/live/knn_truth.parquet"
        val books = Similarity.pqCodebooks(emb)
        val cents = Similarity.kmeansCodebook(emb, 8, 3)
        // pre-train once; time ONLY the recall tail execution per
        // truth variant (the knnIvfPq search is identical across them)
        def searchDf() = Similarity.knnIvfPq(emb)
        (1 to 3).foreach { i =>
          val litTruth = Similarity.knnTruthFrom(spark.read.parquet(pth))
          time(s"exec truth=fresh   $i") {
            noop(Similarity.annRecallIvfPq(emb, truth = None))
          }
          time(s"exec truth=literal $i") {
            noop(Similarity.annRecallIvfPq(emb, truth = Some(litTruth)))
          }
          time(s"exec truth=ckpt    $i") {
            noop(Similarity.annRecallIvfPq(emb,
              truth = Some(spark.read.parquet(pth)
                .select(org.apache.spark.sql.functions.col("qid"),
                  org.apache.spark.sql.functions.col("nid"))
                .localCheckpoint(true))))
          }
        }
      case "truthread2" =>
        noop(Similarity.knnBrute(emb))
        noop(SparkEntry.queries("ann_exact_truth")(spark, d))
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.substring(0, 8)
        val p = s"target/graft_truth/$digest/live/knn_truth.parquet"
        (1 to 3).foreach { i =>
          time(s"knnTruthFrom read $i") {
            Similarity.knnTruthFrom(spark.read.parquet(p))
          }
          time(s"knnIvfPq fn call (trainings only) $i") {
            Similarity.knnIvfPq(emb)
          }
          time(s"kmeansCodebook $i") {
            Similarity.kmeansCodebook(emb, 8, 3)
          }
          time(s"pqCodebooks $i") {
            Similarity.pqCodebooks(emb)
          }
        }
      case "truth" =>
        noop(Similarity.knnBrute(emb))
        (1 to 2).foreach { i =>
          println(s"--- rep $i")
          time("ann_exact_truth entry (derive+persist+readback)") {
            noop(SparkEntry.queries("ann_exact_truth")(spark, d))
          }
          time("ann_recall entry (artifact-read truth)") {
            noop(SparkEntry.queries("ann_recall")(spark, d))
          }
          time("ann_operating_curve_ivf_pq entry") {
            noop(SparkEntry.queries("ann_operating_curve_ivf_pq")(spark, d))
          }
          time("ann_family_comparison entry") {
            noop(SparkEntry.queries("ann_family_comparison")(spark, d))
          }
        }
    }
    spark.stop()
  }
}
