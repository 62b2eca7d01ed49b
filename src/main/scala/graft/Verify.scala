package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [name1,name2,...]")
      sys.exit(2)
    }
    val (sfDir, outDir) = (args(0), args(1))
    // optional comma-separated subset for fast local iteration; the
    // driver always runs the full set (2-arg form)
    val only: Option[Set[String]] =
      if (args.length == 3) Some(args(2).split(",").toSet) else None
    def keep(name: String): Boolean = only.forall(_.contains(name))
    // file > env > defaults — see GraftConfig (config-file parity with
    // the reference's etl_config.yaml; the driver sets env only)
    val cfg = GraftConfig.load()
    val cpus = cfg.cpus.toString
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // plan-diversity crosscheck knob: set to -1 to force every join
    // onto the shuffle path (the plan family a 100 TB run would use
    // once dims outgrow the broadcast threshold) — results must stay
    // hash-identical to the broadcast plans and to DuckDB
    cfg.broadcastThreshold
      .foreach(t => builder.config("spark.sql.autoBroadcastJoinThreshold", t))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // after a checkpointing query, a GC lets the ContextCleaner reap
    // the pinned blocks (same accumulation Bench guards against;
    // targeted so the other ~130 queries don't each pay a full-heap
    // collection)
    val checkpointing = SparkEntry.checkpointingQueries
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        if (checkpointing(name)) System.gc()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The BPE apply-surface oracles carry a placeholder for the trained
    // word→symbols dictionary (the training fold is not SQL-expressible
    // but the apply step given the dictionary is) — resolve it here by
    // training on the SAME fixture the queries ran, so the dumped SQL
    // is self-contained for the driver's DuckDB gate.
    val kept0 = SparkEntry.oracleSql.filter(kv => keep(kv._1))
    // each trained-dictionary placeholder resolves lazily — a subset
    // run that keeps no BPE/unigram oracle never pays the training
    val dicts: Seq[(String, () => String)] = Seq(
      SparkEntry.BpeDictPlaceholder ->
        (() => SparkEntry.bpeDictValues(spark, sfDir)),
      SparkEntry.UnigramDictPlaceholder ->
        (() => SparkEntry.unigramDictValues(spark, sfDir)),
      SparkEntry.OpqLearnedRotPlaceholder ->
        (() => SparkEntry.opqLearnedRotLiteral(spark, sfDir)))
    val kept = dicts.foldLeft(kept0) { case (acc, (ph, mk)) =>
      if (acc.values.exists(_.contains(ph))) {
        val dict = mk()
        acc.map { case (k, v) => k -> v.replace(ph, dict) }
      } else acc
    }
    val json = kept
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
