package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch timing harness for the per-source cap's scale claim: on a
  * source-skewed corpus (80% of rows in ONE source — the real shape of
  * a crawl-dominated mix), the SHIPPED form (Corpus.capPerSource) is
  * the single window over raw source, because Spark 4's
  * WindowGroupLimit pushdown already runs the two-phase plan natively
  * (per-task group-limit before the exchange, so the mega-source never
  * funnels through one sort). The local `twoPhase` def below is the
  * REJECTED hand-salted alternative — it spreads phase 1 over
  * (source, salt) subgroups and re-ranks, and measured 3× slower than
  * letting the optimizer do it. Both forms are asserted
  * result-identical before timing. Run:
  * sbt "Test/runMain graft.CapScaleTime"
  */
object CapScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    // 200x replication with id offsets (~1M rows); ~80% of rows forced
    // into one mega source (crawl-dump skew), text column dropped (the
    // cap reads only ids/source/n_chars — keeps the harness measuring
    // the WINDOW, not text IO)
    val reps = (0 until 200).map { r =>
      base.select((col("doc_id") + lit(r * n)).as("doc_id"),
        lit("x").as("text"),
        col("lang"),
        when(col("doc_id") % 10 < 8, lit("src_mega")).otherwise(col("source"))
          .as("source"),
        (col("n_chars") + lit(r)).as("n_chars"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"rows=${reps.count()}; mega=${reps.filter(col("source") === "src_mega").count()}")

    // the REJECTED alternative: hand-salted two-phase cap (built on
    // the mega-group instinct before measuring — WindowGroupLimit
    // already runs the equivalent two-phase inside the single-window
    // plan, so this pays two windows + two shuffles for nothing)
    def twoPhase(cap: Int): org.apache.spark.sql.DataFrame = {
      val salted = reps.withColumn("salt", pmod(col("doc_id"), lit(32L)))
      val w1 = Window.partitionBy("source", "salt")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val candidates = salted
        .withColumn("r1", row_number().over(w1)).filter(col("r1") <= cap)
      val w2 = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
      candidates.withColumn("rank", row_number().over(w2).cast("long"))
        .filter(col("rank") <= cap)
        .select("source", "rank", "doc_id", "n_chars")
        .orderBy("source", "rank")
    }
    // equality first: both forms must be provably identical
    val a = graft.operators.Corpus.capPerSource(reps, cap = 100).collect().toSeq
    val b = twoPhase(100).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq), "two-phase != single-window")
    println(s"equality verified on ${a.size} capped rows")

    def time(tag: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val got = f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$got)")
        System.gc()
      }
    time("shipped single-window (WindowGroupLimit)") {
      graft.operators.Corpus.capPerSource(reps, cap = 100).count()
    }
    time("rejected hand-salted two-phase          ") { twoPhase(100).count() }
    spark.stop()
  }
}
