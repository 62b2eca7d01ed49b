package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Loader, Tables}

class LoaderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("truncate-and-load then read-back round-trips") {
    val dir = Files.createTempDirectory("graft_load").toString + "/t"
    val src = Tables.nation(spark, sf)
    Loader.truncateAndLoad(src, dir)
    Loader.truncateAndLoad(src, dir)   // second overwrite, no dup rows
    assert(spark.read.parquet(dir).count() === src.count())
  }

  test("upsert keeps the latest row per key, incoming wins ties") {
    val existing = Seq((1L, "old", 10L), (2L, "keep", 20L)).toDF("k", "v", "ver")
    val incoming = Seq((1L, "new", 11L), (3L, "ins", 5L), (2L, "tie", 20L))
      .toDF("k", "v", "ver")
    val r = Loader.upsertKeepLatest(existing, incoming, Seq("k"), "ver")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(r === List((1L, "new"), (2L, "tie"), (3L, "ins")))
  }

  test("scd2 merge closes changed versions and opens new ones") {
    val asOf = java.sql.Date.valueOf("2026-01-15")
    val d0 = java.sql.Date.valueOf("2025-01-01")
    val history = Seq(
      (1L, "FURNITURE", d0, null.asInstanceOf[java.sql.Date], true),
      (2L, "MACHINERY", d0, null.asInstanceOf[java.sql.Date], true)
    ).toDF("k", "segment", "valid_from", "valid_to", "is_current")
    val updates = Seq((1L, "BUILDING"), (2L, "MACHINERY"), (9L, "AUTOMOBILE"))
      .toDF("k", "segment")
    val r = Loader.scd2Merge(history, updates, "k", Seq("segment"), asOf).cache()
    // key 1 changed: closed old + opened new
    val k1 = r.filter(col("k") === 1).orderBy("valid_from").collect()
    assert(k1.length === 2)
    assert(!k1(0).getBoolean(4) && k1(0).getDate(3) === asOf)
    assert(k1(1).getBoolean(4) && k1(1).getString(1) === "BUILDING")
    // key 2 unchanged: single current row
    assert(r.filter(col("k") === 2).count() === 1)
    // key 9 fresh insert, current from asOf
    val k9 = r.filter(col("k") === 9).collect()
    assert(k9.length === 1 && k9(0).getBoolean(4) && k9(0).getDate(2) === asOf)
    r.unpersist()
  }

  test("scd2 merge handles null attribute values (presence flag + null-safe compare)") {
    val asOf = java.sql.Date.valueOf("2026-01-15")
    val d0 = java.sql.Date.valueOf("2025-01-01")
    val ns = null.asInstanceOf[String]
    val history = Seq(
      (1L, "A", "P1", d0, null.asInstanceOf[java.sql.Date], true),
      (2L, ns, "P2", d0, null.asInstanceOf[java.sql.Date], true),
      (3L, "C", "P3", d0, null.asInstanceOf[java.sql.Date], true)
    ).toDF("k", "seg", "pay", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, ns, "P1"), // first tracked attr nulled — IS a change, not "no update"
      (2L, ns, "P2"), // null <=> null — unchanged
      (3L, "C", "P3") // unchanged
    ).toDF("k", "seg", "pay")
    val r = Loader.scd2Merge(history, updates, "k", Seq("seg", "pay"), asOf).cache()
    val k1 = r.filter(col("k") === 1).orderBy("valid_from").collect()
    assert(k1.length === 2, "null-ing a tracked attr must close + open")
    assert(!k1(0).getBoolean(5) && k1(0).getDate(4) === asOf)
    assert(k1(1).getBoolean(5) && k1(1).isNullAt(1))
    assert(r.filter(col("k") === 2).count() === 1, "null==null is no change")
    assert(r.filter(col("k") === 3).count() === 1)
    r.unpersist()
  }

  test("incremental load processes only rows past the watermark") {
    val dir = Files.createTempDirectory("graft_inc").toString + "/sink"
    val src = Seq((1L, 100L), (2L, 200L)).toDF("id", "ver")
    assert(Loader.incrementalLoad(spark, src, "ver", dir) === 2)
    // replay: nothing new
    assert(Loader.incrementalLoad(spark, src, "ver", dir) === 0)
    // one newer row arrives
    val src2 = Seq((1L, 100L), (3L, 300L)).toDF("id", "ver")
    assert(Loader.incrementalLoad(spark, src2, "ver", dir) === 1)
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("incremental load crash-consistency: a committed mark never claims missing data") {
    val dir = Files.createTempDirectory("graft_inc_crash").toString + "/sink"
    val markPath = java.nio.file.Paths.get(dir + ".watermark")
    Loader.incrementalLoad(spark, Seq((1L, 100L), (2L, 200L)).toDF("id", "ver"), "ver", dir)
    // invariant after every successful batch: every version the mark
    // claims is present in the sink
    val mark = Files.readString(markPath).trim.toLong
    val maxInSink = spark.read.parquet(dir).agg(max(col("ver"))).head.getLong(0)
    assert(maxInSink >= mark)
    assert(!Files.exists(markPath.resolveSibling("sink.watermark.tmp")),
      "temp mark must not survive the rename")
    // simulate a crash BETWEEN append and mark-commit: data ahead of the
    // mark. Re-run must re-select those rows (at-least-once), because the
    // mark — not the sink — is the source of truth for progress.
    val crashed = Seq((3L, 300L)).toDF("id", "ver")
    crashed.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    assert(Files.readString(markPath).trim.toLong === mark, "mark unchanged by crash")
    assert(Loader.incrementalLoad(spark, crashed, "ver", dir) === 1,
      "row past the committed mark must be re-processed after a crash")
    assert(Files.readString(markPath).trim.toLong === 300L)
  }

  test("compaction shrinks file count and preserves rows exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = (1 to 10000).map(i => (i.toLong, s"row_$i")).toDF("id", "v")
    df.repartition(40).write.parquet(dir)
    def files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 40)
    val n = Loader.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(n < 40 && files === n)
    val back = spark.read.parquet(dir)
    assert(back.count() === 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum(col("id"))).head.getLong(0)
      === (1 to 10000).map(_.toLong).sum)
    // swap hygiene: neither the rewrite staging dir nor the renamed-aside
    // original may survive a completed compaction
    val siblings = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!siblings.exists(_.endsWith(".compact.tmp")), "staging dir must be swapped away")
    assert(!siblings.exists(_.endsWith(".compact.old")), "old data must be dropped after swap")
  }

  test("compaction recovers a half-swapped directory instead of deleting the only copy") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact_crash").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"row_$i")).toDF("id", "v")
    df.repartition(8).write.parquet(dir)
    // simulate a crash between rename(dir -> old) and rename(tmp -> dir):
    // the data dir is absent and .compact.old holds the ONLY copy
    val f = new java.io.File(dir)
    val old = new java.io.File(dir + ".compact.old")
    assert(f.renameTo(old))
    assert(!f.exists() && old.exists())
    val n = Loader.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(n >= 1)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000, "recovered compaction must preserve every row")
    assert(back.agg(org.apache.spark.sql.functions.sum(col("id"))).head.getLong(0)
      === (1 to 1000).map(_.toLong).sum)
    val siblings = f.getParentFile.listFiles().map(_.getName)
    assert(!siblings.exists(_.endsWith(".compact.tmp")))
    assert(!siblings.exists(_.endsWith(".compact.old")))
  }

  test("native cosine expression matches the declarative HOF form exactly") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val hof = graft.operators.Similarity.vdot(col("va"), col("vb")) /
      (graft.operators.Similarity.vnorm(col("va")) *
        graft.operators.Similarity.vnorm(col("vb")))
    val diff = pairs.select(
        graft.functions.VectorExpressions.cosineSim(col("va"), col("vb")).as("native"),
        hof.as("declarative"))
      .filter(col("native") =!= col("declarative"))
    assert(diff.count() === 0, "native codegen result must be bit-identical")
  }
}
