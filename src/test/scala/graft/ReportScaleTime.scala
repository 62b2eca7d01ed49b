package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness for the corpus_report adjudication (r17 —
  * r16 VERDICT "what's wrong" #1): per-rep stage census so the
  * regression names its stage instead of staying a totals mystery.
  * Run: sbt "Test/runMain graft.ReportScaleTime"
  */
object ReportScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark,
      sys.env.getOrElse("REPORT_DIR", "/root/testdata/sf0.1"))
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    drain(docs.groupBy("lang").count())
    val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, String, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.synchronized {
          stages += ((si.stageId, si.numTasks, si.name.take(70),
            si.taskMetrics.executorRunTime,
            si.taskMetrics.executorCpuTime / 1000000L))
        }
      }
    })
    for (i <- 1 to 6) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      drain(graft.operators.Corpus.report(docs))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val snap = stages.synchronized(stages.toVector)
      println(f"== rep$i wall=$wall%.2f s, stage-cpu total=${snap.map(_._5).sum}ms ==")
      snap.sortBy(-_._5).takeWhile(_._5 > 300).foreach { case (id, nt, n, rt, ct) =>
        println(f"  stage $id%4d tasks=$nt%3d run=${rt}ms cpu=${ct}ms  $n")
      }
      System.gc()
      Thread.sleep(500)
    }
    spark.stop()
  }
}
