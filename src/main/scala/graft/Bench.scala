package graft
import org.apache.spark.sql.SparkSession
object Bench {
  // DCE guard for the calibration workloads: results land here so
  // neither the JVM spin nor the Spark aggregate can be eliminated
  @volatile private var calSink: Long = 0L

  /** Calibration fingerprint (r14 VERDICT #2): the r14 driver artifact
    * ran on a ~21% slower box than the builder's same-HEAD committed
    * run — 14 queries would have been filed as regressions, and the
    * artifact carried nothing a reader could normalize by; the drift
    * was provable only because a same-HEAD twin happened to exist.
    * Every BENCH_FULL now carries its own yardstick: this FIXED
    * workload timed at suite start AND end, plus os loadavg at each
    * point.
    *
    * Two probes, two failure axes: a single-thread pure-JVM integer
    * spin (core speed + scheduling pressure, independent of every
    * Spark config) and a fixed codegen'd aggregate over a GENERATED
    * range on `cores` tasks (task dispatch + whole-stage-codegen
    * throughput — the path every benched query rides). A generated
    * range rather than the cached frame the obvious design reaches
    * for: a cached yardstick silently re-materializes if 244 queries'
    * storage pressure evicted it, so its end-point would measure
    * recomputation, not the box; range generation has no state to
    * evict, so start and end time the identical work by construction.
    *
    * HOW TO READ IT (cross-run comparison): for two artifacts at the
    * same HEAD, ratio their calibration times (jvm for raw core speed,
    * spark for the dispatch path) and divide per-query walls by that
    * ratio before calling anything a regression — uniform residual ≈1
    * is the box, a surviving >1.5x outlier is real. end/start within
    * one artifact bounds mid-suite drift: a co-tenant arriving during
    * the run shows as end/start >> 1 with loadavg rising.
    */
  private[graft] def calibrationJson(spark: SparkSession, cores: Int): String = {
    import org.apache.spark.sql.functions.{col, sum}
    def r3(x: Double): Double = math.round(x * 1000) / 1000.0
    // each probe runs warm-then-measure EVERY call: the first-ever
    // spark probe pays plan codegen and the first spin pays JIT, so a
    // measure-only start point would time compilation the end point
    // doesn't — the per-call warm pass makes both points time
    // identical work by construction (observed: 0.40 vs 0.19 s on an
    // idle box without it)
    def spin(): (Double, Long) = {
      val j0 = System.nanoTime()
      var acc = 1469598103934665603L
      var i = 0
      while (i < 200000000) { acc = (acc ^ i) * 1099511628211L; i += 1 }
      ((System.nanoTime() - j0) / 1e9, acc)
    }
    def sparkProbe(): (Double, Long) = {
      val t0 = System.nanoTime()
      val s = spark.range(0, 256L * 1000 * 1000, 1, cores)
        .select(sum(col("id") * 2654435761L % 999983L)).collect()(0).getLong(0)
      ((System.nanoTime() - t0) / 1e9, s)
    }
    calSink = spin()._2 ^ sparkProbe()._2 // warm pass, result consumed
    val (jvmSec, acc) = spin()
    val (sparkSec, s) = sparkProbe()
    calSink = acc ^ s
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    s"""{"jvm_spin_sec":${r3(jvmSec)},"spark_range_agg_sec":${r3(sparkSec)},"loadavg":${r3(load)}}"""
  }

  def main(args: Array[String]): Unit = {
    // file > env > defaults — see GraftConfig (config-file parity with
    // the reference's etl_config.yaml; the driver sets env only)
    val cfg = GraftConfig.load()
    val sfDir = cfg.sfDir
    val cpus = cfg.cpus.toString
    // broadcastThreshold is deliberately NOT applied here: the env knob
    // exists for Verify's plan-diversity crosscheck, and a shell that
    // exported it for verify would silently bench the shuffle-join
    // plan family, making round artifacts incomparable
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the documented tiny global windows
    // (dim_order_status, rank-after-limit, ntile, percentiles) emit a
    // `WARN WindowExec: No Partition Defined` per execution, and with
    // 143 queries x 2 reps that flood landed AFTER the headline JSON in
    // the driver's 2,000-char stdout tail (BENCH r4-r6 parsed:null).
    // Nothing in a clean bench run should log at WARN.
    spark.sparkContext.setLogLevel("ERROR")
    // Fixture-split parallelism (VERDICT r7 #4): the driver's sf
    // fixtures are single-row-group parquet files, so every scan is
    // ONE task and an expensive map stage (the tokenize+md5 gram
    // family) ran at cpu_util 0.04 — one busy core of 32. Real corpora
    // scan thousands of splits, and maxPartitionBytes cannot split one
    // row group, so re-chunk each table ONCE into cpus-way parquet
    // before timing: scans then parallelize natively with UNCHANGED
    // query plans. (The alternative — a blanket post-scan repartition —
    // was measured at +25 s across the 102 sub-half-second queries:
    // an extra Exchange per scan distorts exactly the small-query tail
    // it doesn't help.) The one-time rewrite happens before the warmup
    // and is not part of any timed region; `sf` in the artifacts keeps
    // naming the ORIGINAL fixture, which the re-chunked copy is
    // row-for-row equal to.
    val benchDir = {
      // events ships TIMESTAMP(NANOS) in some generations — read it the
      // way Tables.events does (nanos as long) so the rewrite is lossless
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      // Re-chunk keyed by the FIXTURE path (r9 — ADVICE): the old fixed
      // shared target/bench_rechunk meant two concurrent bench
      // processes over different sf dirs clobbered each other's copies
      // mid-read, and every invocation — including --only subset runs —
      // paid the full 10-table rewrite. Now each table carries a
      // `_graft_rechunk` marker (source mtime + chunk count; the `_`
      // prefix keeps parquet readers away from it) and is rewritten
      // only when stale, into a PID-keyed temp dir swapped in by
      // rename — so subset runs reuse the standing copy and a
      // concurrent writer never leaves a half-written table visible.
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.substring(0, 8)
      val dir = s"target/bench_rechunk/$digest"
      def deleteRec(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
        f.delete(); ()
      }
      // Sweep stale work dirs from crashed writers (r9 ADVICE): a
      // bench killed mid-rewrite leaves `.tmp_*` (half-written copy)
      // or `.old_*` (swapped-aside previous copy) behind forever.
      // Age-gated at 1 h on the NEWEST mtime in the tree (r11
      // ADVICE), not the directory entry's own mtime — a live writer
      // streaming parquet parts into a tmp dir whose top-level mtime
      // happens to be old keeps refreshing its files' mtimes, so the
      // tree gate never sweeps it mid-write.
      val staleMs = System.currentTimeMillis - 3600L * 1000
      // symlinks are never followed (r12 ADVICE): a link inside a
      // stale tree could cycle (infinite recursion) or point at a
      // fresh foreign mtime that keeps the dir unsweepable forever
      def newestMtime(f: java.io.File): Long =
        // the link's OWN mtime, never the target's (r13 ADVICE: the
        // r12 no-follow fix only stopped recursion — f.lastModified
        // still follows the link, so a symlink to a continually-
        // refreshed foreign file kept its stale tree unsweepable).
        // A node that vanishes between listFiles and the stat (a LIVE
        // concurrent writer's parquet task commit churns .tmp_ files
        // constantly) counts as MinValue instead of aborting the whole
        // bench at startup (r14 ADVICE — the old f.lastModified
        // returned 0L silently; getLastModifiedTime throws).
        ((try java.nio.file.Files.getLastModifiedTime(f.toPath,
            java.nio.file.LinkOption.NOFOLLOW_LINKS).toMillis
          catch { case _: java.io.IOException => Long.MinValue }) +:
          (if (java.nio.file.Files.isSymbolicLink(f.toPath))
            Seq.empty
          else Option(f.listFiles()).toSeq.flatten.map(newestMtime))).max
      Option(new java.io.File(dir).listFiles()).toSeq.flatten
        .filter(f => (f.getName.startsWith(".tmp_") ||
          f.getName.startsWith(".old_")) && newestMtime(f) < staleMs)
        .foreach(deleteRec)
      // Chunk count follows per-table WORK, not a blanket 8 (r9 —
      // VERDICT #3): the r7 blanket 8-way split parallelized the heavy
      // tokenize+md5 gram stages (decontaminate 4.4 -> 1.7 s) but
      // turned the already-sub-half-second knn queries over the tiny
      // embeddings/dim tables into scheduling overhead (knn_lsh
      // 0.46 -> 1.23 s, knn_ivf_trained 0.54 -> 1.42 s — the only r8
      // regressions). Work ~ rows x per-row cost: documents rows cost
      // ~100x a TPC-H row (hundreds of md5'd gram positions each),
      // embeddings rows ~10x (64-dim fold pipelines). One chunk per
      // ~20k weighted rows, capped at min(cpus, 8) — at sf0.1 that is
      // documents/lineitem/orders 8, events 5, embeddings 4 (2,000
      // rows x weight 40 / 20k), every dim table 1.
      val rowWeight = Map("documents" -> 100L, "embeddings" -> 40L)
      for (t <- tables) {
        val src = s"$sfDir/$t.parquet"
        val rows = spark.read.parquet(src).count()
        val chunks = math.min(math.min(cfg.cpus, 8).toLong,
          math.max(1L, (rows * rowWeight.getOrElse(t, 1L) + 19999L) / 20000L))
          .toInt
        val stamp = s"${new java.io.File(src).lastModified}:$chunks"
        val dst = new java.io.File(s"$dir/$t.parquet")
        val marker = new java.io.File(dst, "_graft_rechunk")
        val fresh = marker.isFile && new String(
          java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == stamp
        if (!fresh) {
          val tmp = new java.io.File(
            s"$dir/.tmp_${ProcessHandle.current.pid()}_$t.parquet")
          spark.read.parquet(src).repartition(chunks)
            .write.mode("overwrite").parquet(tmp.toString)
          java.nio.file.Files.write(
            new java.io.File(tmp, "_graft_rechunk").toPath,
            stamp.getBytes("UTF-8"))
          // Swap by rename-aside, not delete-then-rename (r9 ADVICE):
          // the old order had a window where a concurrent reader saw
          // NO table at all between deleteRec(dst) and the rename.
          // Now the stale copy moves aside in one rename (readers see
          // old or new, never nothing) and is deleted only after the
          // new copy is live.
          val aside = new java.io.File(
            s"$dir/.old_${ProcessHandle.current.pid()}_$t.parquet")
          // the pid-qualified aside name can only be THIS process's
          // own leftover from a crashed earlier run with a recycled
          // pid (r11 ADVICE) — clear it or the renameTo below fails
          // with a misleading 'concurrent writer?' abort
          if (aside.exists) deleteRec(aside)
          if (dst.exists && !dst.renameTo(aside))
            throw new IllegalStateException(
              s"bench re-chunk aside-swap failed for $t (concurrent writer?)")
          if (!tmp.renameTo(dst))
            throw new IllegalStateException(
              s"bench re-chunk swap failed for $t (concurrent writer?)")
          deleteRec(aside)
        }
      }
      dir
    }
    // warm the JVM/codegen once so per-query numbers measure the
    // operator, not first-query classloading
    try SparkEntry.queries("q1_pricing_summary")(spark, benchDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // calibration fingerprint, START point (r14 VERDICT #2 — see
    // calibrationJson): after warm-up so the yardstick measures the
    // box, not first-call classloading; its twin runs after the last
    // timed query
    val calStart = calibrationJson(spark, cfg.cpus)
    // min of N reps per query: single-run numbers on a shared box swing
    // 2-3x from GC/scheduling noise; the min is the stable estimate
    val reps = cfg.benchReps
    // optional comma-separated subset for local iteration; the driver
    // leaves this unset and benches everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // Contention self-identification (VERDICT r6 #2): wall time alone
    // can't distinguish "my plan is slow" from "the box is busy" — the
    // driver's post-commit r6 re-run showed q1 at 288 s in-suite vs
    // 2.56 s isolated purely from co-tenant load. Process-CPU time is
    // immune to that: a query whose wall >> cpu/cores spent its life
    // descheduled, and the artifact now says so machine-readably.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    // the SESSION's parallelism, not the machine's core count: with
    // SPARK_GRAFT_CPUS=8 on a 32-core box, process CPU tops out near 8
    // cores, and a /32 denominator would read ~0.25 — the "contended"
    // signature — on a perfectly healthy run
    val cores = cfg.cpus.toDouble
    // Per-query GC attribution (r10 VERDICT #1): process-cpu counts GC
    // threads too, so a collection that fires INSIDE a timed rep gets
    // charged to that query — r10's bm25_batch "4.27 s" carried 48.5
    // cpu-sec of exactly that, and the charge migrated between rounds
    // with wherever the heap happened to fill. The artifact now
    // reports the rep's own stop-the-world GC seconds so any residual
    // pollution names itself.
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcSec(): Double = {
      var ms = 0L
      gcBeans.forEach(b => ms += math.max(0L, b.getCollectionTime))
      ms / 1e3
    }
    // Settle barrier, OUTSIDE every timed region: a full GC enqueues
    // the previous rep's dead block/broadcast references, then the
    // poll waits until the (asynchronous, in-process) ContextCleaner's
    // removal storm stops moving the block census — a deterministic
    // drain signal where a fixed sleep was a guess (r11: 25 ms was
    // usually enough, and the times it wasn't showed up as 2-6x
    // in-suite-vs-isolated outliers with util ~0.1 and zero in-rep
    // GC). Bounded at ~500 ms so a pathological census can't hang the
    // run. This replaces the old targeted after-checkpointing-queries
    // GC — targeting was the bug's other half: every query broadcasts
    // and shuffles, so garbage accumulated across the ~200 untargeted
    // ones and collected mid-rep wherever the heap filled.
    // The census spans storage blocks AND disk blocks: shuffle
    // data/index files never register as storage blocks, so the
    // storage count alone declares "drained" while the cleaner is
    // still deleting the previous queries' shuffle files — deletion
    // I/O and block-manager lock traffic that then lands inside the
    // next timed rep (r11: the residual 2-6x in-suite outliers with
    // util ~0.1 and zero in-rep GC, e.g. validate_ri 2.72 s in-suite
    // vs 0.47 isolated, fit exactly this blind spot).
    def census(): Long =
      org.apache.spark.sql.graft.ColumnBridge.numStorageBlocks +
        org.apache.spark.sql.graft.ColumnBridge.numDiskBlocks
    def settle(): Unit = {
      System.gc()
      var prev = -1L
      var cur = census()
      var polls = 0
      while (cur != prev && polls < 25) {
        Thread.sleep(20)
        prev = cur
        cur = census()
        polls += 1
      }
    }
    // one rep's full measurement — cpu/gc must come from the same rep
    // as the reported wall or util is meaningless. `err` carries the
    // failure instead of SWALLOWING it (r11 VERDICT #2): a throwing
    // query used to bench as a near-zero wall that *improved* the
    // headline; now the exception class+message lands in the artifact
    // per query and the headline names the erroring queries.
    case class Rep(wall: Double, cpu: Double, gc: Double,
                   err: Option[String])
    def timeReps(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                 n: Int): Vector[Rep] = {
      (1 to n).map { _ =>
        settle()
        val g0 = gcSec()
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        // noop sink forces full materialization of every output column
        // (a bare count() would let Spark prune the projections away)
        val err =
          try { fn(spark, benchDir).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable =>
            Some((e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("")).take(200)) }
        Rep((System.nanoTime() - t0) / 1e9,
          (osBean.getProcessCpuTime - c0) / 1e9, gcSec() - g0, err)
      }.toVector
    }
    // Adaptive reps (r11, the interference diagnosis's last layer):
    // the full-rep data showed rep 1 slowest for 215/224 queries and
    // walls STILL FALLING at rep 3 for the outliers — the "isolated"
    // probe was just executions 4-6 of the same generated code, so
    // most of the residual in-suite-vs-isolated gap was per-query
    // JIT/codegen warm-up, not cross-query interference. Keep timing
    // while the newest rep still improves the running min by >10%
    // (floor `reps`, cap reps+5 — raised from +3 in r12: fact_sales
    // was still falling >10% at the old cap, overstating its steady
    // state): a steady-state query pays nothing extra, a
    // warm-up-dominated one earns its converged number in-suite.
    // Convergence is PUBLISHED per query (r11 VERDICT #3): a query
    // whose last rep still improved >10% on the prior min when the
    // cap cut it off carries converged:false instead of passing its
    // cap-truncated min off as steady state.
    def timeConverged(name: String,
                      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Vector[Rep] = {
      var acc = timeReps(name, fn, reps)
      while (acc.length >= 2 && acc.length < reps + 5 &&
        stillImproving(acc)) {
        acc = acc ++ timeReps(name, fn, 1)
      }
      acc
    }
    // convergence is judged on CLEAN reps only (the same discipline as
    // the published min): an erroring rep's near-zero wall must neither
    // trigger extra reps nor mask a still-warming query. The PUBLISHED
    // flag looks at clean.last alone (r13 ADVICE: requiring
    // acc.last.err.isEmpty here let a query whose FINAL rep errored
    // publish converged:true while its clean reps were still falling
    // >10% — the error is a stop condition for the extension loop,
    // not evidence of steady state)
    def cleanStillImproving(acc: Vector[Rep]): Boolean = {
      val clean = acc.filter(_.err.isEmpty)
      clean.length >= 2 &&
        clean.last.wall < clean.init.map(_.wall).min * 0.9
    }
    // extension-loop condition: an erroring last rep stops extending
    // (re-running a breaking query buys nothing), separately from the
    // clean-rep improvement signal
    def stillImproving(acc: Vector[Rep]): Boolean =
      acc.last.err.isEmpty && cleanStillImproving(acc)
    def isConverged(acc: Vector[Rep]): Boolean = !cleanStillImproving(acc)
    // keep ALL reps: the min is the estimate, but the spread is the
    // in-suite diagnosis — stable-slow reps ([2.7, 2.7, 2.7] against a
    // fast isolated probe) mean positional interference to go fix;
    // one outlier rep means box noise the min already absorbed
    val repsAll = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .map { case (name, fn) => name -> timeConverged(name, fn) }
    // a rep that THREW must not feed the published numbers (r12 ADVICE
    // — the r11 fix only NAMED the error while a fast-failing rep
    // could still win the min and flatter the per-query wall, the
    // headline subset, and the suite total): the min is taken over
    // CLEAN reps only; a query with zero clean reps publishes
    // wall:null, is excluded from `value`, and stays in err_queries
    val results: Seq[(String, Option[Rep])] = repsAll.map { case (name, rs) =>
      name -> rs.filter(_.err.isEmpty).sortBy(_.wall).headOption }
    // Box-noise self-defense: in-suite numbers on a shared box swing up
    // to ~48x from co-tenant load/GC pressure (r5: dim_movement_type
    // 22.8 s in-suite vs 0.47 s alone). Re-measure the 5 slowest after
    // the suite so an outlier explains itself in the artifact instead
    // of needing a manual SPARK_GRAFT_BENCH_ONLY re-run. N=3 with the
    // spread reported (r10 VERDICT #1): the old single-rep probe
    // self-contradicted (decontaminate_bloom 5.80 s isolated vs 2.79
    // in-suite was one unlucky rep presented as truth) — min is the
    // estimate, max bounds the noise the reader should trust it to.
    val resultMap0 = results.collect { case (k, Some(rep)) => k -> rep }.toMap
    val isolated = results.collect { case (k, Some(rep)) => (k, rep) }
      .sortBy(-_._2.wall).take(5).map { case (name, _) =>
      name -> timeConverged(name, SparkEntry.queries(name)) }
    // calibration fingerprint, END point — after every timed region,
    // so end/start bounds the drift the suite actually ran under
    val calEnd = calibrationJson(spark, cfg.cpus)
    def util(wall: Double, cpu: Double): Double =
      if (wall <= 0) 0.0 else math.round(cpu / (wall * cores) * 1000) / 1000.0
    def r3(x: Double): Double = math.round(x * 1000) / 1000.0
    // Full per-query map goes to files: with 138 queries the one-line
    // JSON outgrew the driver's 2,000-char stdout tail capture
    // (BENCH_r04 parsed:null), so stdout carries a compact headline
    // subset that always lands intact in the tail. target/ is wiped by
    // later sbt runs, so the same map is also written round-stamped at
    // the repo root (committed — the durable per-round record).
    // Per query: wall sec, process-cpu sec, cpu_util = cpu/(wall*cores).
    // On an idle box a shuffle-heavy query sits around util 0.3-0.9; a
    // contended run collapses toward 0 (the JVM was descheduled), so a
    // "slow" artifact now carries its own diagnosis.
    val repsMap = repsAll.toMap
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val full = results.map { case (k, repOpt) =>
      val rs = repsMap(k)
      // first failing rep's message, if any — the artifact must name
      // a bench-only breakage instead of letting a ~0 s erroring rep
      // flatter the headline (r11 VERDICT #2; r12 ADVICE closed the
      // flattering itself — see `results` above)
      val errField = rs.flatMap(_.err).headOption
        .map(m => ",\"err\":" + jstr(m)).getOrElse("")
      // max_over_min names a post-min blowup (r12 VERDICT #3: the
      // converged flag only tests the LAST rep vs the min, so a rep
      // sequence like [3.4, 1.9, 1.1, 9.7] published converged:true
      // while its final rep blew up 9x — the min is still the right
      // estimate, but the spread must name itself in the artifact)
      val clean = rs.filter(_.err.isEmpty).map(_.wall)
      val spreadField =
        if (clean.size >= 2 && clean.min > 0)
          ",\"max_over_min\":" + r3(clean.max / clean.min)
        else ""
      val wallFields = repOpt match {
        case Some(rep) =>
          "\"wall\":" + rep.wall + ",\"cpu\":" + rep.cpu +
            ",\"cpu_util\":" + util(rep.wall, rep.cpu) +
            ",\"gc\":" + r3(rep.gc)
        case None => "\"wall\":null"
      }
      s"\"" + k + "\":{" + wallFields +
        ",\"reps\":" + rs.map(t => r3(t.wall)).mkString("[", ",", "]") +
        ",\"converged\":" + isConverged(rs) + spreadField + errField + "}" }
      .mkString("{", ",", "}")
    val iso = isolated.map { case (k, reps3) =>
      // same clean-rep discipline as the in-suite min: an isolation
      // rep that threw must not publish a flattering near-zero wall
      // (isolation candidates are drawn from clean in-suite results,
      // so an all-erroring probe is a real finding — published as
      // isolated:null with the error visible in isolated_reps' walls)
      val cleanIso = reps3.filter(_.err.isEmpty)
      val isoFields = cleanIso.sortBy(_.wall).headOption match {
        case Some(best) =>
          ",\"isolated\":" + best.wall +
            ",\"isolated_max\":" + r3(cleanIso.map(_.wall).max) +
            ",\"isolated_cpu_util\":" + util(best.wall, best.cpu)
        case None => ",\"isolated\":null"
      }
      s"\"" + k + "\":{\"in_suite\":" + resultMap0(k).wall + isoFields +
        ",\"isolated_reps\":" + reps3.map(t => r3(t.wall)).mkString("[", ",", "]") +
        "}" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).map(_.wall).sum
    val totalCpu = results.flatMap(_._2).map(_.cpu).sum
    val totalGc = results.flatMap(_._2).map(_.gc).sum
    // headline-level honesty rollups: every query with ANY erroring
    // rep, and every query whose adaptive reps hit the cap still
    // improving >10% (its min overstates steady state)
    val errQueries = repsAll.filter(_._2.exists(_.err.isDefined)).map(_._1)
    val notConverged = repsAll.filterNot(kv => isConverged(kv._2)).map(_._1)
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","cpu_sec":$totalCpu,"cpu_util":${util(total, totalCpu)},"gc_sec":${r3(totalGc)},"cores":${cores.toInt},"calibration":{"start":$calStart,"end":$calEnd},"err_queries":${errQueries.map(jstr).mkString("[", ",", "]")},"not_converged":${notConverged.map(jstr).mkString("[", ",", "]")},"queries":$full,"isolated_slowest":$iso,"sf":"$sfDir"}"""
    // round = 1 + newest driver-committed BENCH_r<N>.json at the root
    val roundN = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .flatMap(f => "^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(f.getName)
        .map(_.group(1).toInt))
      .foldLeft(0)(math.max) + 1
    // subset runs (SPARK_GRAFT_BENCH_ONLY) must not clobber the
    // committed round artifact with a partial map
    val paths = Seq("target/bench_full.json") ++
      (if (only.isEmpty) Seq(f"BENCH_FULL_r$roundN%02d.json") else Nil)
    for (path <- paths) {
      try {
        val p = java.nio.file.Paths.get(path)
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(p, fullJson.getBytes("UTF-8"))
      } catch { case _: Throwable => () }
    }
    // r15 refresh (VERDICT r14 #7): the old 43-query subset predated
    // the ANN/tokenizer surface that now dominates suite cost — the
    // composed rotate->residual trio, its r15 apply-only twin, and a
    // pretrained tokenizer apply join so the headline tracks what is
    // actually expensive (the trio alone was ~11 s of the r14 suite).
    val headline = Vector(
      "fact_sales", "fact_inventory", "fact_inventory_wh", "fact_pnl",
      "fact_transactions", "scd2_customer", "q1_pricing_summary",
      "q3_top_unshipped", "q5_region_volume", "q9_profit_nation",
      "q18_big_orders", "q21_waiting_suppliers", "top_customers",
      "supplier_scorecard", "sessionize_events", "dedup_exact",
      "dedup_minhash", "decontaminate", "knn_cosine_bruteforce",
      "knn_ivf", "knn_lsh", "embedding_centroids", "doc_chunks",
      "token_counts", "reconcile_orders", "order_value_percentiles",
      "dedup_jaccard", "dedup_clusters", "dedup_prune",
      "corpus_sample", "seq_pack", "tfidf_top_terms",
      "seq_pack_sequences", "embedding_quantize", "snapshot_diff",
      "zorder_layout", "dedup_admit", "fact_transactions_cdc",
      "dedup_reconcile", "knn_ivf_pq", "passage_scrub",
      "corpus_select_budget", "doc_quality_verdict",
      "knn_ivf_pq_residual_opq_learned",
      "ann_recall_ivf_pq_residual_opq_learned",
      "ann_operating_curve_ivf_pq_residual_opq_learned",
      "knn_ivf_pq_residual_opq_pretrained",
      "bpe_encode_pretrained",
      // r15.2: the session's two new families' flagships — the
      // ExactSubstr positional-gram span detector (token-scale
      // explode + checkpoint) and the audio aligned-vote near-dup
      "repeated_spans", "audio_near_dup",
      // r16: the round's three new families' flagships — held-out
      // stupid-backoff scoring (five model joins), DSIR hashed-ngram
      // weights (token-scale feature map), and SemDeDup (kmeans
      // training + in-cell pairs + component closure per call)
      "doc_trigram_backoff", "dsir_weights", "semdedup_prune",
      // r17: the round's two heaviest new entries — graph-ANN beam
      // search (edge build + 3 unrolled hops) and semantic admission
      // (standing chain + collision join + batch-internal chain)
      "knn_graph", "semdedup_admit")
    val qs = headline.flatMap(k => resultMap0.get(k).map(rep =>
        s"\"" + k + "\":" + r3(rep.wall)))
      .mkString("{", ",", "}")
    // `value` stays the TOTAL across all queries; `n_queries` records how
    // many it covers since `queries` lists only the headline subset.
    // suite cpu_util rides along so a contended run is visible in the
    // tail too, not only in the full artifact.
    val headlineJson =
      s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","n_queries":${results.size},"cpu_util":${util(total, totalCpu)},"err_queries":${errQueries.map(jstr).mkString("[", ",", "]")},"queries":$qs,"sf":"$sfDir"}"""
    // stop() BEFORE the headline print: executor/shutdown log lines can
    // no longer interleave after the JSON in the driver's stdout-tail
    // capture — the headline is the process's final stdout line.
    // Belt-and-braces vs any remaining sbt framing (VERDICT r7 #1): the
    // same headline also lands in a fixed file at the repo root, so the
    // round record survives even if a future sbt version re-frames
    // stdout. Subset runs skip the file, same as BENCH_FULL above.
    if (only.isEmpty) {
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_HEADLINE.json"),
        headlineJson.getBytes("UTF-8"))
      catch { case _: Throwable => () }
    }
    spark.stop()
    println(headlineJson)
  }
}
