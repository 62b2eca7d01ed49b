package graft

import org.apache.spark.sql.SparkSession

/** Dump full `.explain("formatted")` output for named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the committed evidence files
  * the optimization rounds' plan claims are checked against.
  * Run: sbt "Test/runMain graft.PlanDump <tag> <suffix> [query ...]"
  * (no query list = the full registry).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <suffix> [query ...]")
    val (tag, suffix) = (args(0), args(1))
    val cfg = GraftConfig.load()
    val spark = SparkSession.builder()
      .master(s"local[${cfg.cpus}]")
      .config("spark.sql.shuffle.partitions", cfg.cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = cfg.sfDir
    // PRE-CHECKPOINT stage plans (r18, VERDICT r17 #10): operators
    // that localCheckpoint an early stage hide its native nodes behind
    // the LogicalRDD their final dumped plan scans — the covariance
    // family's cov_terms fan-out was invisible in every r17 dump. A
    // `<name>__stage` pseudo-query dumps the stage plan itself.
    val stagePlans: Map[String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "embedding_covariance__terms_stage" -> ((s, dd) =>
        graft.operators.Similarity.covarianceTerms(
          graft.sources.Tables(s, dd, "embeddings"))))
    val qs = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    for (q <- qs) {
      val df = stagePlans.getOrElse(q, SparkEntry.queries(q))(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(dir.resolve(s"${q}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      System.err.println(s"[plandump] $q -> plans/$tag/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
