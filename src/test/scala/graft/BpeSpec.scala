package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe
import graft.sources.Tables

/** The BPE trainer has no DuckDB oracle (the greedy merge fold is not
  * SQL-expressible — see Bpe scaladoc), so this spec carries the full
  * correctness burden: an INDEPENDENT in-memory reference
  * implementation (plain Scala collections, index-walk greedy apply —
  * deliberately a different formulation than the distributed
  * fold) must agree bit-for-bit on the entire merge table and on
  * every per-doc token count, on both a planted corpus and the real
  * fixture corpus.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- reference implementation ------------------------------------

  private def refWordCounts(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def refApply(s: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.size) {
      if (i + 1 < s.size && s(i) == l && s(i + 1) == r) { out += (l + r); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** (merge table, final word → symbols). `byteLevel` mirrors the
    * engine's GPT-2-style byte-mode base alphabet (r14).
    */
  private def refTrain(docs: Seq[String], nMerges: Int,
                       byteLevel: Boolean = false)
      : (Seq[(Long, String, String, String, Long)], Map[String, Vector[String]]) = {
    val wc = refWordCounts(docs)
    def initial(w: String): Vector[String] =
      if (byteLevel)
        w.getBytes("UTF-8").map(b => f"<0x${b & 0xff}%02X>").toVector :+ "</w>"
      else w.map(_.toString).toVector :+ "</w>"
    var syms: Map[String, Vector[String]] =
      wc.keys.map(w => w -> initial(w)).toMap
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 1L
    var done = false
    while (!done && rank <= nMerges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, s) <- syms; p <- s.sliding(2) if p.size == 2)
        pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + wc(w)
      val best = pc.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= 2L =>
          merges += ((rank, l, r, l + r, c))
          syms = syms.map { case (w, s) => w -> refApply(s, l, r) }
          rank += 1
        case _ => done = true
      }
    }
    (merges.result(), syms)
  }

  private def collectMerges(df: org.apache.spark.sql.DataFrame) =
    df.select("rank", "lhs", "rhs", "merged", "pair_count").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq

  // ---- planted corpus ----------------------------------------------

  test("planted corpus: full merge table is bit-equal to the reference") {
    // engineered so several merges tie and cascade: "low low low",
    // repeated bigrams, a word that exercises the consecutive-pair
    // greedy case (aaa)
    val texts = Seq(
      "low low low lower lowest",
      "new newer newest new new",
      "aaa aaa aaab",
      "low new lower newer")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = collectMerges(Bpe.merges(docs, nMerges = 12))
    val (want, _) = refTrain(texts, nMerges = 12)
    assert(got === want)
  }

  test("planted corpus: per-doc BPE token counts match the reference dictionary") {
    val texts = Seq("low low lower", "new newest aaa", "low new")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (_, refSyms) = refTrain(texts, nMerges = 8)
    val want = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      i.toLong -> ((ws.length.toLong, ws.map(w => refSyms(w).size.toLong).sum))
    }.toMap
    val got = Bpe.tokenCounts(docs, nMerges = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  private def refEncodeDigest(text: String,
      refSyms: Map[String, Vector[String]]): (Long, String) = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .flatMap(refSyms(_))
    val bytes = java.security.MessageDigest.getInstance("MD5")
      .digest(toks.mkString(" ").getBytes("UTF-8"))
    (toks.length.toLong, bytes.map("%02x".format(_)).mkString)
  }

  test("encode: per-doc token stream digest matches the reference encoder") {
    val texts = Seq("low low lower", "new newest aaa", "low new", "aaa aaab low")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (_, refSyms) = refTrain(texts, nMerges = 8)
    val want = texts.zipWithIndex
      .map { case (t, i) => i.toLong -> refEncodeDigest(t, refSyms) }.toMap
    val got = Bpe.encode(docs, nMerges = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === want)
  }

  // ---- real corpus --------------------------------------------------

  test("fixture corpus: merge table matches the reference; counts bounded") {
    val docs = Tables.documents(spark, sf)
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val got = collectMerges(Bpe.merges(docs, nMerges = 8))
    val (want, refSyms) = refTrain(texts, nMerges = 8)
    assert(got === want)
    // token counts: each word is at least 1 symbol, at most chars+1
    val tc = Bpe.tokenCounts(docs, nMerges = 8).collect()
    assert(tc.nonEmpty)
    tc.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: fewer BPE tokens than words")
    }
    // spot-check one doc end-to-end against the reference dictionary
    val doc0 = docs.select("doc_id", "text").orderBy("doc_id").first()
    val ws = doc0.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val wantTokens = ws.map(w => refSyms(w).size.toLong).sum
    val gotTokens = tc.find(_.getLong(0) == doc0.getLong(0)).get.getLong(2)
    assert(gotTokens === wantTokens)
    // encode agrees with tokenCounts on every doc's token count, and
    // with the reference encoder's digest on the spot-checked doc
    val enc = Bpe.encode(docs, nMerges = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    tc.foreach(r => assert(enc(r.getLong(0))._1 === r.getLong(2)))
    assert(enc(doc0.getLong(0)) === refEncodeDigest(doc0.getString(1), refSyms))
  }

  test("encodeWith/tokenCountsWith: pre-trained apply equals self-training and builds with ZERO jobs (r13)") {
    val docs = Tables.documents(spark, sf)
    // train ONCE — the deployment artifact
    val (merges, wordsDf) = Bpe.train(docs, nMerges = 8)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(wordsDf)
    // the apply path must not train: building both plans launches no
    // Spark job (the self-training path runs 2 jobs per merge round
    // eagerly before the first apply stage exists)
    var encW: org.apache.spark.sql.DataFrame = null
    var tcW: org.apache.spark.sql.DataFrame = null
    val jobs = TestSpark.jobsDuring {
      encW = Bpe.encodeWith(docs, merges)
      tcW = Bpe.tokenCountsWith(docs, merges)
    }
    assert(jobs === 0, s"apply-only plan build launched $jobs Spark jobs")
    // frame equality with the self-training forms: greedy per-word
    // application is history-free, so composing the rank-ordered folds
    // equals train()'s checkpointed rounds exactly
    val wantEnc = Bpe.encode(docs, nMerges = 8).collect().toSeq
    val gotEnc = encW.collect().toSeq
    assert(gotEnc === wantEnc)
    val wantTc = Bpe.tokenCounts(docs, nMerges = 8).collect().toSeq
    val gotTc = tcW.collect().toSeq
    assert(gotTc === wantTc)
    // unseen-word deployment: encoding a corpus containing words the
    // artifact never saw still segments (char seeds always available)
    import spark.implicits._
    val fresh = Seq((900L, "zzqx low", "en", "srcX", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val freshRows = Bpe.encodeWith(fresh, merges).collect()
    assert(freshRows.length === 1 && freshRows(0).getLong(1) >= 2L)
  }

  test("merge artifact round-trips through parquet into the apply overload (r13)") {
    val docs = Tables.documents(spark, sf)
    // the real deployment loop: train -> land the artifact -> a later
    // job reads it back and encodes with it
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_artifact")
      .toString + "/merges"
    graft.operators.Bpe.merges(docs, nMerges = 8).write.parquet(dir)
    val loaded = Bpe.mergesFrom(spark.read.parquet(dir))
    val (direct, w) = Bpe.train(docs, nMerges = 8)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(w)
    assert(loaded === direct, "artifact must survive the parquet round-trip")
    assert(Bpe.encodeWith(docs, loaded).collect().toSeq ===
      Bpe.encode(docs, nMerges = 8).collect().toSeq)
  }

  // ---- r14: byte-level mode (GPT-2 convention) ------------------------

  test("byte-level BPE: merge table bit-equal to the byte-mode reference on planted and fixture corpora (r14)") {
    // the planted corpus deliberately mixes scripts: byte-level
    // training sees ONLY <0xNN> symbols, so CJK and latin share one
    // closed base alphabet
    val plantedDocs = Seq("low low low lower", "测试 测试 newest")
    val planted = plantedDocs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val want = refTrain(plantedDocs, 12, byteLevel = true)._1
    val got = collectMerges(Bpe.merges(planted, nMerges = 12, byteLevel = true))
    assert(got === want)
    // every learned symbol is built from the byte alphabet (closed space)
    // (r14 ADVICE: precedence — && binds tighter than ||, so the old
    // unparenthesized form let any "</w>"-suffixed merge skip the
    // l+r==m and byte-alphabet checks entirely)
    assert(got.forall { case (_, l, r, m, _) =>
      (l + r) == m && (m.startsWith("<0x") || m.endsWith("</w>")) })
    // fixture corpus
    val docs = Tables.documents(spark, sf)
    val fixtureDocs = docs.select("text").collect().map(_.getString(0)).toSeq
    val wantFx = refTrain(fixtureDocs, 8, byteLevel = true)._1
    val gotFx = collectMerges(Bpe.merges(docs, nMerges = 8, byteLevel = true))
    assert(gotFx === wantFx)
  }

  test("byte-level encode: digest matches the reference encoder; expression equals fold (r14)") {
    val docs = Seq((1L, "low low lower"), (2L, "测试 low")).toDF("doc_id", "text")
    val (merges, w) = Bpe.train(docs, nMerges = 8, byteLevel = true)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(w)
    // reference per-doc digest over the same greedy application
    val (refMerges, refSyms) = refTrain(Seq("low low lower", "测试 low"), 8,
      byteLevel = true)
    assert(collectMerges(Bpe.merges(docs, nMerges = 8, byteLevel = true))
      === refMerges)
    val wantDigests = Map(
      1L -> Seq("low", "low", "lower"), 2L -> Seq("测试", "low")
    ).map { case (id, ws) =>
      val stream = ws.flatMap(refSyms).mkString(" ")
      id -> java.security.MessageDigest.getInstance("MD5")
        .digest(stream.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val got = Bpe.encode(docs, nMerges = 8, byteLevel = true).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got === wantDigests)
    // apply-surface twins agree in byte mode too
    assert(dictRows(Bpe.applyTrainedWords(docs, merges, byteLevel = true)) ===
      dictRows(Bpe.applyTrainedWordsFold(docs, merges, byteLevel = true)))
    assert(Bpe.encodeWith(docs, merges, byteLevel = true).collect().toSeq ===
      Bpe.encode(docs, nMerges = 8, byteLevel = true).collect().toSeq)
  }

  // ---- r14: production merge counts (VERDICT r13 #2) -----------------

  private def dictRows(df: org.apache.spark.sql.DataFrame) =
    df.select("word", "syms").collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toList))
      .sortBy(_._1).toSeq

  test("native apply expression is frame-equal to the nested-fold form (r14)") {
    val docs = Tables.documents(spark, sf)
    val (merges, w) = Bpe.train(docs, nMerges = 16)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(w)
    // the trained table on the real fixture dictionary
    assert(dictRows(Bpe.applyTrainedWords(docs, merges)) ===
      dictRows(Bpe.applyTrainedWordsFold(docs, merges)))
    // adversarial synthetic table: overlapping pair ("aaa" + (a,a) must
    // scan greedily to [aa, a]), cascades that consume earlier merges'
    // output, a merge into the terminal marker, and pairs that never fire
    import spark.implicits._
    val planted = Seq((1L, "aaa aaaa aab abab"), (2L, "baa ab a b"))
      .toDF("doc_id", "text")
    val synth = Seq(
      Bpe.Merge(1L, "a", "a", "aa", 9L),
      Bpe.Merge(2L, "aa", "a", "aaa", 9L),
      Bpe.Merge(3L, "a", "b", "ab", 9L),
      Bpe.Merge(4L, "ab", "</w>", "ab</w>", 9L),
      Bpe.Merge(5L, "q", "z", "qz", 9L))
    assert(dictRows(Bpe.applyTrainedWords(planted, synth)) ===
      dictRows(Bpe.applyTrainedWordsFold(planted, synth)))
    // the greedy-scan pin itself
    val got = dictRows(Bpe.applyTrainedWords(planted, synth)).toMap
    assert(got("aaa") === List("aaa", "</w>"))
    // rank-ordered PASSES, not lowest-rank-pair-first: pass 1 (a,a)
    // greedily takes both adjacencies of "aaaa" -> [aa, aa], so pass 2
    // (aa,a) finds no bare "a" — the HF priority-queue apply would
    // give [aaa, a] here; this engine's contract is the Sennrich pass
    // order, and the fold form agrees bit-for-bit (asserted above)
    assert(got("aaaa") === List("aa", "aa", "</w>"))
    assert(got("abab") === List("ab", "ab</w>"))
  }

  test("apply plan size and codegen are constant in the merge count (r14)") {
    val docs = Tables.documents(spark, sf)
    // synthetic artifact scaled 16 -> 4096 merges (mostly non-firing,
    // the realistic shape: one word touches a tiny slice of a 32k
    // vocabulary). The fold form grew the PLAN linearly here — the
    // documented Janino collapse; the expression must not.
    def synth(n: Int): Seq[Bpe.Merge] =
      (0 until n).map(i => Bpe.Merge(i + 1L, s"q$i", s"z$i", s"q${i}z$i", 1L))
    def planChars(ms: Seq[Bpe.Merge]): Int =
      Bpe.encodeWith(docs, ms).queryExecution.optimizedPlan
        .treeString.length
    val small = planChars(synth(16))
    val big = planChars(synth(4096))
    assert(big <= (small * 1.1).toInt + 2048,
      s"plan grew with merge count: $small chars @16 vs $big @4096")
    // and the big-artifact plan still builds with zero training jobs
    val jobs = TestSpark.jobsDuring { Bpe.encodeWith(docs, synth(4096)) }
    assert(jobs === 0)
    // a 1k-merge REAL chain still encodes correctly end to end: rank
    // order preserved through the reference-object table (first 16
    // real merges followed by non-firing filler must equal the plain
    // 16-merge artifact's output)
    val (real, w) = Bpe.train(docs, nMerges = 16)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(w)
    val padded = real ++ (0 until 1000).map(i =>
      Bpe.Merge(real.length + i + 1L, s"q$i", s"z$i", s"q${i}z$i", 1L))
    assert(Bpe.encodeWith(docs, padded).collect().toSeq ===
      Bpe.encodeWith(docs, real).collect().toSeq)
  }
}
