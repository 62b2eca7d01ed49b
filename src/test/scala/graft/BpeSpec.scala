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

  // ---- r15: batched trainer (VERDICT r14 #1) -------------------------

  /** INDEPENDENT in-memory reference of the batched contract (plain
    * collections, same conflict rule and candidate-scan cap as the
    * engine's scaladoc states): per round, candidates sorted by
    * (count desc, lhs, rhs), scanned to depth 8·K + 8, greedily
    * accepted iff lhs/rhs disjoint from every already-accepted
    * member's {lhs, rhs, merged}; accepted merges applied
    * sequentially in rank order before the next recount.
    */
  private def refTrainBatched(docs: Seq[String], nMerges: Int, batchK: Int,
                              byteLevel: Boolean = false)
      : (Seq[(Long, String, String, String, Long)],
         Map[String, Vector[String]], Int) = {
    val wc = refWordCounts(docs)
    def initial(w: String): Vector[String] =
      if (byteLevel)
        w.getBytes("UTF-8").map(b => f"<0x${b & 0xff}%02X>").toVector :+ "</w>"
      else w.map(_.toString).toVector :+ "</w>"
    var syms: Map[String, Vector[String]] =
      wc.keys.map(w => w -> initial(w)).toMap
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var total = 0
    var rounds = 0
    var done = false
    while (!done && total < nMerges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, s) <- syms; p <- s.sliding(2) if p.size == 2)
        pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + wc(w)
      val cands = pc.toSeq.filter(_._2 >= 2L)
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .take(8 * batchK + 8)
      rounds += 1
      if (cands.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val want = math.min(batchK, nMerges - total)
        var accepted = 0
        val batch = Seq.newBuilder[(String, String, Long)]
        for (((l, r), c) <- cands if accepted < want)
          if (!used(l) && !used(r)) {
            batch += ((l, r, c))
            used += l; used += r; used += (l + r)
            accepted += 1
          }
        for ((l, r, c) <- batch.result()) {
          total += 1
          merges += ((total.toLong, l, r, l + r, c))
          syms = syms.map { case (w, s) => w -> refApply(s, l, r) }
        }
      }
    }
    (merges.result(), syms, rounds)
  }

  private def collectBatched(docs: org.apache.spark.sql.DataFrame,
                             nMerges: Int, batchK: Int,
                             byteLevel: Boolean = false) = {
    val (m, w, rounds) = Bpe.trainBatched(docs, nMerges, batchK, byteLevel)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(w)
    (m.map(x => (x.rank, x.lhs, x.rhs, x.merged, x.pair_count)), rounds)
  }

  test("batched trainer: bit-equal to the independent batched reference " +
    "on planted, fixture, and byte-level corpora (r15)") {
    val texts = Seq(
      "low low low lower lowest",
      "new newer newest new new",
      "aaa aaa aaab",
      "low new lower newer")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (got, gotRounds) = collectBatched(docs, nMerges = 12, batchK = 4)
    val (want, _, wantRounds) = refTrainBatched(texts, 12, 4)
    assert(got === want)
    assert(gotRounds === wantRounds)
    // byte-level mode threads through the batched loop too
    val (gotB, _) = collectBatched(docs, nMerges = 10, batchK = 4,
      byteLevel = true)
    assert(gotB === refTrainBatched(texts, 10, 4, byteLevel = true)._1)
    // real fixture corpus
    val fx = Tables.documents(spark, sf)
    val fxTexts = fx.select("text").collect().map(_.getString(0)).toSeq
    val (gotFx, _) = collectBatched(fx, nMerges = 8, batchK = 4)
    assert(gotFx === refTrainBatched(fxTexts, 8, 4)._1)
  }

  test("batched K=1 degenerates to the unbatched trainer exactly (r15)") {
    // with one acceptance per round the batch IS the argmax — the
    // schedules coincide by construction, so the tables must too.
    // Compared against the retained UNBATCHED reference implementation
    // (r17: the public train() now delegates to the batched loop at
    // K = 1, so this pin is what licenses that delegation).
    val docs = Tables.documents(spark, sf)
    val (got, rounds) = collectBatched(docs, nMerges = 8, batchK = 1)
    val (refM, refW) = Bpe.trainUnbatchedReference(docs, nMerges = 8)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(refW)
    assert(got === refM.map(x => (x.rank, x.lhs, x.rhs, x.merged, x.pair_count)))
    assert(rounds === 8,
      s"K=1 must run exactly one round per merge, ran $rounds")
  }

  test("equivalence class: batched table IS the unbatched table when " +
    "batch members are disjoint and no created pair outranks (r15)") {
    // three tiers with strictly separated counts — (a,b)=16, (c,d)=12,
    // (e,f)=10 — each pair living in TWO contexts so the pairs a merge
    // CREATES carry half its count (8/6/5) and never outrank the next
    // tier; all symbols pairwise distinct, so nothing conflicts
    val texts =
      Seq.fill(8)("xaby") ++ Seq.fill(8)("zabw") ++
      Seq.fill(6)("mcdn") ++ Seq.fill(6)("pcdq") ++
      Seq.fill(5)("gefh") ++ Seq.fill(5)("iefj")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (batched, rounds) = collectBatched(docs, nMerges = 3, batchK = 3)
    val unbatched = collectMerges(Bpe.merges(docs, nMerges = 3))
    assert(batched === unbatched)
    assert(batched.map(_._5) === Seq(16L, 12L, 10L))
    // and the whole table landed in ONE accepting round
    assert(rounds <= 2, s"disjoint top-3 should batch in one round, took $rounds")
  }

  test("divergence mode (a) pinned: a conflict-skip defers a merge one " +
    "round — same merge SET, permuted ranks, counts exact (r15)") {
    // (a,b)=8 and (b,m)=6 SHARE symbol b (no overlapping occurrences —
    // different words), (c,d)=5 is disjoint; created pairs are 4s/3s.
    // Batched K=2 skips (b,m) inside round 1 and takes it in round 2;
    // unbatched takes it second. Set equal, order permuted.
    val texts =
      Seq.fill(4)("xaby") ++ Seq.fill(4)("zabw") ++
      Seq.fill(3)("sbmt") ++ Seq.fill(3)("ubmv") ++
      Seq.fill(3)("pcdq") ++ Seq.fill(2)("rcds")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (batched, _) = collectBatched(docs, nMerges = 3, batchK = 2)
    val unbatched = collectMerges(Bpe.merges(docs, nMerges = 3))
    assert(batched === Seq(
      (1L, "a", "b", "ab", 8L), (2L, "c", "d", "cd", 5L),
      (3L, "b", "m", "bm", 6L)))
    assert(unbatched === Seq(
      (1L, "a", "b", "ab", 8L), (2L, "b", "m", "bm", 6L),
      (3L, "c", "d", "cd", 5L)))
    // the divergence is pure SCHEDULING: same merges, same counts
    assert(batched.map(m => (m._2, m._3, m._5)).toSet ===
      unbatched.map(m => (m._2, m._3, m._5)).toSet)
  }

  test("divergence mode (b) pinned: a pair CREATED by a batch member " +
    "that outranks a later member is taken by unbatched first (r15)") {
    // merging (a,b) in the one-word corpus "ab" creates (ab,</w>) at
    // the SAME count 5 — unbatched recounts and takes it before
    // (c,d)=4; batched committed to (c,d) from the pre-round counts
    val texts = Seq.fill(5)("ab") ++ Seq.fill(4)("cd")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (batched, _) = collectBatched(docs, nMerges = 2, batchK = 2)
    val unbatched = collectMerges(Bpe.merges(docs, nMerges = 2))
    assert(batched === Seq(
      (1L, "a", "b", "ab", 5L), (2L, "c", "d", "cd", 4L)))
    assert(unbatched === Seq(
      (1L, "a", "b", "ab", 5L), (2L, "ab", "</w>", "ab</w>", 5L)))
    // both schedules' counts are exact for what they selected — the
    // divergence is WHICH pair ran second, never a miscounted one
  }

  test("encodeBatched: per-doc digest matches the reference encoder " +
    "under the batched dictionary; artifact round-trips (r15)") {
    val texts = Seq("low low lower", "new newest aaa", "low new", "aaa aaab low")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (_, refSyms, _) = refTrainBatched(texts, 8, 4)
    val want = texts.zipWithIndex
      .map { case (t, i) => i.toLong -> refEncodeDigest(t, refSyms) }.toMap
    val got = Bpe.encodeBatched(docs, nMerges = 8, batchK = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === want)
    // the batched artifact drives the standard pretrained apply path
    val loaded = Bpe.mergesFrom(Bpe.mergesBatched(docs, nMerges = 8, batchK = 4))
    assert(Bpe.encodeWith(docs, loaded).collect().toSeq ===
      Bpe.encodeBatched(docs, nMerges = 8, batchK = 4).collect().toSeq)
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

  test("fertility: per-lang rollup of the doc-grain token counts; both ratios ≥ 1") {
    val docs = Tables.documents(spark, sf)
    val f = Bpe.fertility(docs, nMerges = 8).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(f.nonEmpty)
    // every word is ≥ 1 token; chars-per-token is positive but CAN
    // dip below 1 at low merge counts — n_syms counts the Sennrich
    // terminal </w> (chars + 1 − merges applied), the documented
    // marker-inclusive accounting
    f.values.foreach { case (_, _, _, fert, cpt) =>
      assert(fert >= 1.0 && cpt > 0.0)
    }
    // totals agree with the doc-grain tokenCounts re-aggregated
    val byDoc = Bpe.tokenCounts(docs, nMerges = 8)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("nd"), sum(col("n_words")).as("nw"),
        sum(col("n_bpe_tokens")).as("nt"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(f.map { case (l, v) => l -> ((v._1, v._2, v._3)) } === byDoc)
    // the fairness signal is real on the fixture: languages differ
    val ferts = f.values.map(_._4).toSeq
    info(s"fertility spread: ${ferts.min} .. ${ferts.max}")
  }
}
