package graft

/** Typed run configuration — parity with the reference's config-file
  * orchestration (config/etl_config.yaml read through
  * core/config_manager.py before main.py:94 run_full_etl; connection,
  * chunk and flag settings come from the file with env fallback). The
  * Spark re-expression keeps the same precedence chain — config file >
  * environment > defaults — over a dependency-free
  * java.util.Properties file (the YAML the reference uses is a flat
  * key/value mapping, which Properties covers without adding a
  * parser dependency).
  *
  * Consumed by Bench (sfDir/cpus/reps) and Verify (those plus
  * broadcastThreshold — the plan-diversity knob) and by Etl.buildAll's
  * config overload. Bench deliberately ignores broadcastThreshold so
  * its round artifacts always measure the same (broadcast) plan
  * family; use Verify for shuffle-plan crosschecks. The env names are
  * the ones the round driver already sets, so an absent file changes
  * nothing.
  */
final case class GraftConfig(
    sfDir: String,
    outDir: String,
    cpus: Int,
    broadcastThreshold: Option[String],
    benchReps: Int)

object GraftConfig {

  /** Load configuration. `path` defaults to $SPARK_GRAFT_CONFIG, so a
    * deployment can mount one file and leave the code untouched; a
    * missing file silently degrades to env/defaults (same contract as
    * the reference's config_manager defaults).
    */
  def load(path: Option[String] = sys.env.get("SPARK_GRAFT_CONFIG")): GraftConfig = {
    val props = new java.util.Properties()
    path.map(new java.io.File(_)).filter(_.isFile).foreach { f =>
      val in = new java.io.FileInputStream(f)
      try props.load(in) finally in.close()
    }
    def get(key: String, env: String): Option[String] =
      Option(props.getProperty(key)).orElse(sys.env.get(env))
    GraftConfig(
      sfDir = get("sf.dir", "SPARK_GRAFT_SF_DIR")
        .getOrElse("/root/testdata/sf0.1"),
      outDir = get("out.dir", "SPARK_GRAFT_OUT_DIR")
        .getOrElse("target/warehouse"),
      cpus = get("cpus", "SPARK_GRAFT_CPUS")
        .getOrElse(Runtime.getRuntime.availableProcessors().toString).toInt,
      broadcastThreshold =
        get("broadcast.threshold", "SPARK_GRAFT_BROADCAST_THRESHOLD"),
      benchReps = get("bench.reps", "SPARK_GRAFT_BENCH_REPS")
        .getOrElse("2").toInt)
  }
}
