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
    // ---- r14 (VERDICT r13 #2): pretrained APPLY at production merge
    // counts. The old nested-fold apply composed nMerges aggregate
    // expressions — plan depth and generated code linear in the
    // artifact size (Janino 64KB collapse at 30k+ merges). The native
    // BpeApplyMerges expression carries the table as a reference
    // object: plan constant, per-word cost two hash probes per
    // non-firing merge. Measure BOTH forms, fresh plans per point
    // (run the expression points FIRST — the fresh-JVM-control
    // lesson: later sections inherit JIT warm-up, which here only
    // biases AGAINST the expression form).
    def synth(n: Int): Seq[graft.operators.Bpe.Merge] =
      (0 until n).map(i =>
        graft.operators.Bpe.Merge(i + 1L, s"q$i", s"z$i", s"q${i}z$i", 1L))
    val (real16, w16) = graft.operators.Bpe.train(docs1, nMerges = 16)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(w16)
    def encodeCount(form: String, ms: Seq[graft.operators.Bpe.Merge]): Unit = {
      val dict =
        if (form == "expr") graft.operators.Bpe.applyTrainedWords(docs1, ms)
        else graft.operators.Bpe.applyTrainedWordsFold(docs1, ms)
      dict.write.format("noop").mode("overwrite").save()
    }
    for (n <- Seq(16, 1024, 8192)) {
      val ms = real16 ++ synth(n - 16)
      timeIt(s"apply-dict EXPR $n merges (reference-object table)") {
        encodeCount("expr", ms)
      }
    }
    // fold-form collapse is even EARLIER than the predicted Janino
    // 64KB bound: at ~100 nested folds the ANALYZER itself gives up
    // (Resolution hits its 100-iteration cap — measured: FOLD 128
    // merges throws, where EXPR runs 8192 flat). The failure is the
    // finding; catch it so the harness prints it as a data point.
    for (n <- Seq(16, 64, 128)) {
      val ms = real16 ++ synth(n - 16)
      try timeIt(s"apply-dict FOLD $n merges (nMerges nested aggregates)") {
        encodeCount("fold", ms)
      } catch { case e: Throwable =>
        println(s"apply-dict FOLD $n merges FAILED: " +
          e.getMessage.linesIterator.next())
      }
    }

    // ---- r15 (VERDICT r14 #1): TRAINING at production merge counts.
    // train() runs one Spark round (pair-count agg + argmax collect +
    // checkpoint) PER merge — 256 merges = 256 sequential rounds;
    // trainBatched accepts top-K non-conflicting merges per round, so
    // the round count collapses toward nMerges/K (conflict-skips keep
    // it above the floor on real text — the measured number IS the
    // claim). Single run per point: the unbatched 256-merge baseline
    // is the expensive thing being dethroned.
    // the fixture corpus may EXHAUST (no pair left with count >= 2)
    // before the requested merge count — report the trained size
    // instead of assuming it, so the point stays honest either way
    def once(tag: String)(f: => (Int, Int)): Unit = {
      val t0 = System.nanoTime()
      val (rounds, trained) = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        f"$rounds Spark rounds, $trained merges trained")
    }
    for (n <- Seq(64, 256)) {
      once(s"train UNBATCHED $n merges") {
        val (m, words) = graft.operators.Bpe.train(docs1, nMerges = n)
        org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(words)
        (m.size, m.size)
      }
      for (k <- Seq(16, 32)) {
        once(s"train BATCHED  $n merges K=$k") {
          val (m, words, rounds) =
            graft.operators.Bpe.trainBatched(docs1, nMerges = n, batchK = k)
          org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(words)
          (rounds, m.size)
        }
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
