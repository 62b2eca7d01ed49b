package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramLm
import graft.sources.Tables

/** Unigram-LM tokenizer training (UnigramLm.scala) — the BpeSpec
  * discipline: the distributed pipeline is rows-only (sequential DP,
  * not SQL-expressible), so correctness is proven by BIT-EXACT
  * equality against this file's independent in-memory reference
  * implementation, plus closed-form planted cases.
  */
class UnigramSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- independent reference implementation (driver-side, plain
  // Scala over a collected word-count map; no Spark expressions) ----

  private val L = UnigramLm.MaxPieceLen
  private val INF = Long.MaxValue / 4

  private def log2(x: Double) = StrictMath.log(x) / StrictMath.log(2.0)

  private def refCosts(counts: Map[String, Long]): Map[String, Long] = {
    val total = counts.values.sum.toDouble
    counts.map { case (p, c) =>
      p -> Math.round((log2(total) - log2(c.toDouble)) * 1e6)
    }
  }

  private def refViterbi(word: String, costs: Map[String, Long]): Seq[String] = {
    val n = word.length
    val dp = Array.fill(n + 1)((0L, -1))
    for (i <- 1 to n) {
      var bc = INF; var bf = i - 1; var first = true
      for (len <- 1 to L) {
        val c =
          if (i >= len && dp(i - len)._1 < INF)
            costs.get(word.substring(i - len, i))
              .map(dp(i - len)._1 + _).getOrElse(INF)
          else INF
        // strict-less argmin scanning len 1..L: ties keep the
        // SHORTEST piece — the pinned tie-break the fold uses
        if (first || c < bc) { bc = c; bf = i - len; first = false }
      }
      dp(i) = (bc, bf)
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) { val f = dp(pos)._2; out.prepend(word.substring(f, pos)); pos = f }
    out.toList
  }

  // Soft E-step reference (r13): forward–backward expected piece
  // usage in NANO units, mirroring fbExpectedNano TERM-FOR-TERM —
  // same pow, same len-ascending ordered sums (0.0 placeholders for
  // invalid arms included), same ((α·p)·β)/Z association, same
  // floor(x·1e9 + 0.5) quantization per occurrence.
  private def refFbExpectedNano(word: String,
      costs: Map[String, Long]): Map[String, Long] = {
    val probs = costs.map { case (s, c) =>
      s -> StrictMath.pow(2.0, -(c.toDouble / 1e6)) }
    val n = word.length
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    for (i <- 1 to n) {
      var s = 0.0
      for (len <- 1 to L) {
        val t = if (i >= len)
          probs.get(word.substring(i - len, i))
            .map(alpha(i - len) * _).getOrElse(0.0)
        else 0.0
        s += t
      }
      alpha(i) = s
    }
    // betaRev(j) = β(n − j); β(n) = 1
    val betaRev = new Array[Double](n + 1)
    betaRev(0) = 1.0
    for (j <- 1 to n) {
      var s = 0.0
      for (len <- 1 to L) {
        val t = if (j >= len)
          probs.get(word.substring(n - j, n - j + len))
            .map(_ * betaRev(j - len)).getOrElse(0.0)
        else 0.0
        s += t
      }
      betaRev(j) = s
    }
    val z = alpha(n)
    val out = scala.collection.mutable.Map.empty[String, Long]
    if (z > 0.0) for (i <- 1 to n; len <- 1 to L if i >= len) {
      val piece = word.substring(i - len, i)
      probs.get(piece).foreach { p =>
        val e = alpha(i - len) * p * betaRev(n - i) / z
        val nano = math.floor(e * 1e9 + 0.5).toLong
        out(piece) = out.getOrElse(piece, 0L) + nano
      }
    }
    out.toMap
  }

  // Kudo §3.2 reference loss primitive: Viterbi COST of `word` with
  // one piece excluded (its substrings stay available)
  private def refViterbiCostExcluding(word: String, costs: Map[String, Long],
                                      skip: String): Long = {
    val n = word.length
    val dp = Array.fill(n + 1)(INF)
    dp(0) = 0L
    for (i <- 1 to n; len <- 1 to math.min(L, i)) {
      val piece = word.substring(i - len, i)
      if (piece != skip) costs.get(piece).foreach { c =>
        if (dp(i - len) < INF && dp(i - len) + c < dp(i)) dp(i) = dp(i - len) + c
      }
    }
    dp(n)
  }

  private def refTrain(wc: Map[String, Long], vocabSize: Int, seedSize: Int,
                       iters: Int,
                       pruneByLoss: Boolean = false,
                       softEm: Boolean = false): Seq[(Long, String, Long, Long)] = {
    val seedPairs = wc.toSeq.flatMap { case (w, n) =>
      (0 until w.length).flatMap(i =>
        (1 to math.min(L, w.length - i)).map(l => (w.substring(i, i + l), n)))
    }
    val seeds = seedPairs.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    if (seeds.isEmpty) return Seq.empty
    val chars = seeds.filter(_._1.length == 1)
    val top = seeds.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var counts: Map[String, Long] = chars ++ top
    def emRound(vocab: Map[String, Long]): Map[String, Long] = {
      val costs = refCosts(vocab)
      val usage = scala.collection.mutable.Map.empty[String, Long]
      if (!softEm)
        wc.foreach { case (w, n) =>
          refViterbi(w, costs).foreach(p =>
            usage(p) = usage.getOrElse(p, 0L) + n)
        }
      else {
        wc.foreach { case (w, n) =>
          refFbExpectedNano(w, costs).foreach { case (p, nano) =>
            usage(p) = usage.getOrElse(p, 0L) + nano * n }
        }
        usage.filterInPlace { case (_, u) => u > 0L }
      }
      // coverage floor is one OCCURRENCE on each E-step's own scale:
      // 1 hard count, `quantum` (1e9) soft nano-count — mirrors the
      // engine's quantum-relative floor (r13 ADVICE)
      val floorCount = if (softEm) 1000000000L else 1L
      usage.toMap ++ chars.keys.filterNot(usage.contains)
        .map(_ -> floorCount)
    }
    for (_ <- 1 to iters) counts = emRound(counts)
    // both schedules spend vocabSize multi-char slots + the char union
    // (budget parity, r12 ADVICE); the loss product saturates like the
    // engine's multiplyHigh guard
    val kept =
      if (!pruneByLoss)
        counts.toSeq.filter(_._1.length > 1)
          .sortBy { case (p, c) => (-c, p) }
          .take(vocabSize).map(_._1).toSet ++ chars.keys
      else {
        val costs = refCosts(counts)
        counts.toSeq.filter(_._1.length > 1).map { case (p, c) =>
          val alt = refViterbiCostExcluding(p, costs, p)
          val loss =
            if (alt >= INF) Long.MaxValue
            else {
              val d = alt - costs(p)
              val lo = c * d
              if (Math.multiplyHigh(c, d) != (lo >> 63)) Long.MaxValue else lo
            }
          (p, loss)
        }.sortBy { case (p, l) => (-l, p) }
          .take(vocabSize).map(_._1).toSet ++ chars.keys
      }
    counts = emRound(counts.filter(kv => kept(kv._1)))
    val costs = refCosts(counts)
    counts.toSeq.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, c), i) => (i + 1L, p, c, costs(p)) }
  }

  private def collectedWordCounts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("unigram LM: planted corpus learns the multi-char piece and segments with it") {
    val planted = Seq((1L, "ab ab ab"), (2L, "ab cd")).toDF("doc_id", "text")
    val vocab = UnigramLm.vocab(planted).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // 'ab' carries weight 4 and wins rank 1: Viterbi prefers the
    // single piece over a+b (one cost term beats two of anything)
    assert(vocab.head._2 === "ab" && vocab.head._3 === 4L, s"got ${vocab.toSeq}")
    assert(vocab.map(_._2).contains("cd"))
    // ranks are 1..n and dense
    assert(vocab.map(_._1).toSeq === (1L to vocab.length).toSeq)
    val tc = UnigramLm.tokenCounts(planted).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every 'ab'/'cd' word is exactly ONE trained piece
    assert(tc(1L) === ((3L, 3L)))
    assert(tc(2L) === ((2L, 2L)))
  }

  test("unigram LM: distributed training is bit-identical to the independent reference") {
    val docs = Tables.documents(spark, sf)
    val got = UnigramLm.train(docs)
      .map(p => (p.rank, p.piece, p.n_count, p.cost_micro))
    val want = refTrain(collectedWordCounts(docs), 64, 256, 2)
    assert(got.nonEmpty)
    assert(got === want, {
      val d = got.zip(want).find { case (a, b) => a != b }
      s"first divergence: $d"
    })
    // multi-character pieces actually emerged (the trainer is not
    // degenerating to a character model on real text)
    assert(got.count(_._2.length > 1) > 10, s"vocab ${got.map(_._2).take(20)}")
  }

  test("unigram LM: token counts match the reference segmentation doc-for-doc") {
    val docs = Tables.documents(spark, sf)
    val pieces = refTrain(collectedWordCounts(docs), 64, 256, 2)
    val costs = pieces.map(p => p._2 -> p._4).toMap
    val want = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val words = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      r.getLong(0) -> ((words.length.toLong,
        words.map(w => refViterbi(w, costs).length.toLong).sum))
    }.toMap
    val got = UnigramLm.tokenCounts(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    // structural bounds: at least one piece per word, at most one per char
    got.values.foreach { case (nw, nt) => assert(nt >= nw) }
  }

  test("unigram LM: Kudo-loss pruning is bit-identical to the reference; keeps the near-free high-usage piece OUT (r12)") {
    val docs = Tables.documents(spark, sf)
    val got = UnigramLm.train(docs, pruneByLoss = true)
      .map(p => (p.rank, p.piece, p.n_count, p.cost_micro))
    val want = refTrain(collectedWordCounts(docs), 64, 256, 2, pruneByLoss = true)
    assert(got.nonEmpty)
    assert(got === want, {
      val d = got.zip(want).find { case (a, b) => a != b }
      s"first divergence: $d"
    })
    // the two prune schedules genuinely disagree on this corpus (if
    // they coincided, the heuristic gap the loss ranking closes would
    // be untestable here) — report the symmetric difference
    val usage = UnigramLm.train(docs).map(_.piece).toSet
    val loss = got.map(_._2).toSet
    info(s"usage-kept-only: ${(usage -- loss).size}, loss-kept-only: ${(loss -- usage).size}")
    // planted case: 'of' is segmentable as o+f at modest extra cost
    // wherever o/f are common; a piece that cannot be re-segmented
    // cheaply must survive loss pruning. Structural floor: every
    // single char still present (coverage), ranks dense.
    assert(got.map(_._1).toSeq === (1L to got.length).toSeq)
  }

  test("unigram LM: encode digest matches the reference encoder doc-for-doc (r12)") {
    val docs = Tables.documents(spark, sf)
    val pieces = refTrain(collectedWordCounts(docs), 64, 256, 2)
    val costs = pieces.map(p => p._2 -> p._4).toMap
    def refDigest(text: String): (Long, String) = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => refViterbi(w, costs))
      val bytes = java.security.MessageDigest.getInstance("MD5")
        .digest(toks.mkString(" ").getBytes("UTF-8"))
      (toks.length.toLong, bytes.map("%02x".format(_)).mkString)
    }
    val want = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> refDigest(r.getString(1))).toMap
    val got = UnigramLm.encode(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === want)
    // and the stream length agrees with tokenCounts on every doc
    val tc = UnigramLm.tokenCounts(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (n, _)) => assert(n === tc(id)) }
  }

  test("unigram LM: soft-EM (forward-backward) training is bit-identical to the independent reference (r13)") {
    val docs = Tables.documents(spark, sf)
    val got = UnigramLm.train(docs, softEm = true)
      .map(p => (p.rank, p.piece, p.n_count, p.cost_micro))
    val want = refTrain(collectedWordCounts(docs), 64, 256, 2, softEm = true)
    assert(got.nonEmpty)
    assert(got === want, {
      val d = got.zip(want).find { case (a, b) => a != b }
      s"first divergence: $d"
    })
    assert(got.count(_._2.length > 1) > 10, s"vocab ${got.map(_._2).take(20)}")
  }

  test("unigram LM: soft-EM keeps fractional credit where hard EM starves a piece to zero (r13)") {
    import spark.implicits._
    // "abab" corpus: Viterbi's winner-take-all segments every word as
    // the whole-word piece (cheapest single arc), so "ab" collects
    // ZERO hard counts and vanishes from the model after one round;
    // forward-backward gives the ab+ab path its posterior mass, so
    // "ab" survives with fractional credit — the exact behavioral gap
    // between the two E-steps, pinned through the published vocabs
    val planted = (0 until 16).map(i =>
        (i.toLong, "abab", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val hard = UnigramLm.vocab(planted, vocabSize = 16, iters = 1).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val soft = UnigramLm.vocabSoftEm(planted, vocabSize = 16, iters = 1)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(!hard.contains("ab"),
      s"hard EM should starve 'ab' (winner-take-all): $hard")
    assert(soft.get("ab").exists(_ > 0L),
      s"soft EM must keep fractional credit on 'ab': $soft")
    // both keep the dominant whole-word piece
    assert(hard.contains("abab") && soft.contains("abab"))
  }

  test("unigram LM: encodeWith/tokenCountsWith pre-trained apply equals self-training and builds with ZERO jobs (r13)") {
    val docs = Tables.documents(spark, sf)
    // train ONCE — the piece-table artifact a deployment ships
    val pieces = UnigramLm.train(docs)
    var encW: org.apache.spark.sql.DataFrame = null
    var tcW: org.apache.spark.sql.DataFrame = null
    val jobs = TestSpark.jobsDuring {
      encW = UnigramLm.encodeWith(docs, pieces)
      tcW = UnigramLm.tokenCountsWith(docs, pieces)
    }
    assert(jobs === 0, s"apply-only plan build launched $jobs Spark jobs")
    // frame equality with the self-training forms: Viterbi under the
    // SAME literal cost map segments identically whether the map came
    // from a fresh train() or the shipped artifact
    val wantEnc = UnigramLm.encode(docs).collect().toSeq
    assert(encW.collect().toSeq === wantEnc)
    val wantTc = UnigramLm.tokenCounts(docs).collect().toSeq
    assert(tcW.collect().toSeq === wantTc)
    // unseen-word deployment: single-char coverage is part of the
    // artifact contract, so a WORD the trainer never saw segments —
    // as long as its characters appeared in the training corpus
    // (coverage is corpus-alphabet-scoped, stated in the scaladoc)
    import spark.implicits._
    val fresh = Seq((901L, "tnemucod the", "en", "srcX", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val freshRows = UnigramLm.encodeWith(fresh, pieces).collect()
    assert(freshRows.length === 1 && freshRows(0).getLong(1) >= 2L)
  }

  test("unigram LM: soft-EM composes with loss pruning — the flag matrix's last cell, bit-equal to the reference (r13)") {
    val docs = Tables.documents(spark, sf)
    val got = UnigramLm.train(docs, pruneByLoss = true, softEm = true)
      .map(p => (p.rank, p.piece, p.n_count, p.cost_micro))
    val want = refTrain(collectedWordCounts(docs), 64, 256, 2,
      pruneByLoss = true, softEm = true)
    assert(got.nonEmpty)
    assert(got === want, {
      val d = got.zip(want).find { case (a, b) => a != b }
      s"first divergence: $d"
    })
  }

  test("piece artifact round-trips through parquet into the apply overload (r13)") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_uni_artifact")
      .toString + "/pieces"
    UnigramLm.vocab(docs).write.parquet(dir)
    val loaded = UnigramLm.piecesFrom(spark.read.parquet(dir))
    val direct = UnigramLm.train(docs)
    assert(loaded === direct, "artifact must survive the parquet round-trip")
    assert(UnigramLm.encodeWith(docs, loaded).collect().toSeq ===
      UnigramLm.encode(docs).collect().toSeq)
  }
}
