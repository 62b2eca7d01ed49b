package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit harness: dumps formatted physical plans of the heavy
  * operators so shuffle/broadcast/pushdown shape can be reviewed.
  * Run: sbt "Test/runMain graft.ExplainAudit [query ...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("fact_sales", "q5_region_volume", "asof_join_events_orders",
        "dedup_jaccard", "decontaminate", "q9_profit_nation", "events_sliding",
        "seq_pack", "tfidf_top_terms", "dedup_admit", "fact_transactions_cdc",
        "dedup_reconcile", "passage_dedup", "doc_unigram_logloss")
    for (q <- qs) {
      println(s"\n================ $q")
      println(SparkEntry.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(5000))
    }
    spark.stop()
  }
}
