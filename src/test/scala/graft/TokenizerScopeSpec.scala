package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bpe, UnigramLm}

/** Non-whitespace-script scope pinning (r14, VERDICT r13 #4): both
  * tokenizer families pre-tokenize on `\s+`, so scriptio-continua
  * text (CJK and friends) degenerates to whole-sentence "words", and
  * the unigram coverage contract spans only the TRAINING alphabet.
  * These specs pin what actually happens on planted CJK fixtures —
  * no silent degenerate lattice, no undefined fallback — and the
  * scaladocs state the deployment guidance (SentencePiece's <unk> /
  * byte-fallback conventions upstream of this engine).
  */
class TokenizerScopeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("scriptio-continua text is ONE dictionary word per whitespace run (pinned)") {
    val docs = Seq((1L, "这是一个测试句子 测试句子"), (2L, "测试句子"))
      .toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // no segmentation happens below whitespace: the 8-char run is one
    // dictionary entry — at corpus scale this means CJK dictionaries
    // are SENTENCE-scale, the documented cost of `\s+` pre-tokenization
    assert(wc === Map("这是一个测试句子" -> 1L, "测试句子" -> 2L))
  }

  test("BPE trains on CJK code points; expression and fold agree including astral chars") {
    // 测试 adjacency occurs 5x (dominant), plus an ASTRAL (surrogate-
    // pair) musical symbol to pin code-point handling end to end
    val docs = Seq((1L, "测试 测试 测试句 句子 句子"), (2L, "𝄞音 𝄞音 测试"))
      .toDF("doc_id", "text")
    val (merges, w) = Bpe.train(docs, nMerges = 4)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(w)
    assert(merges.nonEmpty)
    assert((merges.head.lhs, merges.head.rhs) === ("测", "试"),
      s"top CJK pair should win the first merge: ${merges.head}")
    // the native apply expression must agree with the fold form on
    // CJK AND on the astral char (code-unit vs code-point splits
    // would diverge exactly here)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("word", "syms").collect()
        .map(r => (r.getString(0), r.getSeq[String](1).toList)).sortBy(_._1).toSeq
    assert(rows(Bpe.applyTrainedWords(docs, merges)) ===
      rows(Bpe.applyTrainedWordsFold(docs, merges)))
    // end-to-end encode is well-defined on the CJK corpus
    assert(Bpe.encodeWith(docs, merges).collect().length === 2)
  }

  test("unigram trains on CJK: the whole-sentence word's lattice stays MaxPieceLen-bounded and learns multi-char pieces") {
    val docs = Seq((1L, "测试句子测试句子 测试"), (2L, "测试句子"))
      .toDF("doc_id", "text")
    val pieces = UnigramLm.train(docs)
    assert(pieces.nonEmpty)
    // the DP width is MaxPieceLen regardless of word length, so the
    // 8-char sentence-word trains fine — the COST of scriptio
    // continua is dictionary cardinality, not lattice width
    assert(pieces.forall(_.piece.length <= UnigramLm.MaxPieceLen))
    assert(pieces.exists(_.piece.length > 1),
      "a repeated CJK n-gram must survive as a multi-char piece")
    assert(UnigramLm.encode(docs).collect().length === 2)
  }

  test("unseen-script arrival under a pre-trained artifact: deterministic char-split fallback with OOV pieces (deployment maps to <unk>/byte-fallback upstream)") {
    val latin = Seq((1L, "the cat sat on the mat"), (2L, "the mat"))
      .toDF("doc_id", "text")
    val pieces = UnigramLm.train(latin)
    val vocab = pieces.map(_.piece).toSet
    val cjk = Seq((9L, "测试句子")).toDF("doc_id", "text")
    // the artifact never saw these chars: the Viterbi lattice is
    // unreachable and the traceback degrades to the documented
    // char-split — every emitted "piece" is OUTSIDE the artifact
    val dict = UnigramLm.wordPiecesWith(cjk, pieces).collect()
    assert(dict.length === 1)
    val ps = dict(0).getSeq[String](1).toList
    assert(ps === List("测", "试", "句", "子"),
      s"unseen-script fallback must be the per-char split, got $ps")
    assert(ps.forall(p => !vocab.contains(p)),
      "fallback pieces are out-of-vocabulary by construction")
    // the encode surface stays total and deterministic over it
    val enc = UnigramLm.encodeWith(cjk, pieces).collect()
    assert(enc.length === 1 && enc(0).getLong(1) === 4L)
    // BPE's fallback is benign by construction: unseen words keep
    // their char symbols (no merge fires), nothing is OOV because
    // BPE symbols ARE substrings of the word itself
    val (m, w) = Bpe.train(latin, nMerges = 8)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(w)
    val bpeEnc = Bpe.encodeWith(cjk, m).collect()
    assert(bpeEnc.length === 1 && bpeEnc(0).getLong(1) === 5L) // 4 chars + </w>
  }

  test("byte-level BPE closes the script scope: any corpus trains over the 256-token base; unseen scripts at apply time stay in-space (r14)") {
    // CJK trains byte-level: the dominant char's three UTF-8 bytes
    // merge back into one symbol — the trainer RECOVERS characters
    // from bytes instead of needing them as primitives
    val cjk = Seq((1L, "测试 测试 测试"), (2L, "测试句子")).toDF("doc_id", "text")
    val (m, w) = graft.operators.Bpe.train(cjk, nMerges = 8, byteLevel = true)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(w)
    assert(m.nonEmpty)
    // every adjacent byte pair inside 测试 occurs exactly 4 times
    // (3 + 1), so the first merge is decided by the (lhs, rhs)
    // tie-break: "<0x8B>" (测's last byte, meeting 试's first) sorts
    // lowest — the deterministic-tie contract, exercised on bytes
    assert((m.head.lhs, m.head.rhs, m.head.pair_count) ===
      (("<0x8B>", "<0xE8>", 4L)),
      s"tie-broken first byte merge: ${m.head}")
    // and the learned table rebuilds multi-byte units: some merged
    // symbol spans a full 3-byte CJK char or more
    assert(m.exists(_.merged.count(_ == '<') >= 3),
      s"merges should recover at least a full char from bytes: $m")
    // a LATIN-trained byte-level artifact applied to CJK emits ONLY
    // in-space tokens: unmerged <0xNN> bytes + the terminal — the
    // closed-space property char-level BPE has, now with a base
    // alphabet no script can escape
    val latin = Seq((1L, "the cat sat"), (2L, "the mat")).toDF("doc_id", "text")
    val (lm, lw) = graft.operators.Bpe.train(latin, nMerges = 8, byteLevel = true)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(lw)
    val dict = graft.operators.Bpe
      .applyTrainedWords(Seq((9L, "测试")).toDF("doc_id", "text"), lm,
        byteLevel = true).collect()
    val syms = dict(0).getSeq[String](1).toList
    assert(syms === List("<0xE6>", "<0xB5>", "<0x8B>",
      "<0xE8>", "<0xAF>", "<0x95>", "</w>"),
      s"latin byte artifact must leave CJK as raw byte tokens: $syms")
  }

  test("byte fallback: unseen-script pieces re-emit as <0xNN> tokens (closed space); no-op frame equality where coverage is complete (r14)") {
    val latin = Seq((1L, "the cat sat on the mat"), (2L, "the mat"))
      .toDF("doc_id", "text")
    val pieces = UnigramLm.train(latin)
    val cjk = Seq((9L, "测试")).toDF("doc_id", "text")
    // 测 = E6 B5 8B, 试 = E8 AF 95 in UTF-8: the char-split fallback
    // pieces expand to exactly these six byte tokens — every one
    // inside the FIXED 256-token byte space, never an arbitrary OOV
    // string (the SentencePiece byte_fallback contract)
    val enc = UnigramLm.encodeWithByteFallback(cjk, pieces).collect()
    assert(enc.length === 1)
    assert(enc(0).getLong(1) === 6L, s"expected 6 byte tokens: ${enc(0)}")
    val wantMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("<0xE6> <0xB5> <0x8B> <0xE8> <0xAF> <0x95>"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(enc(0).getString(2) === wantMd5,
      "byte tokens must be the word's exact UTF-8 bytes in order")
    // where the artifact's alphabet covers the corpus, fallback never
    // fires: BIT-identical to the plain apply (the oracle contract —
    // the registry key shares unigram_encode's SQL on this basis)
    assert(UnigramLm.encodeWithByteFallback(latin, pieces).collect().toSeq ===
      UnigramLm.encodeWith(latin, pieces).collect().toSeq)
    // mixed word: known chars segment normally, the unseen char alone
    // expands — fallback is per-PIECE, not per-word
    val mixed = Seq((5L, "cat测")).toDF("doc_id", "text")
    val dict = UnigramLm.wordPiecesWith(mixed, pieces).collect()
    val rawPieces = dict(0).getSeq[String](1).toList
    val encMixed = UnigramLm.encodeWithByteFallback(mixed, pieces).collect()
    val vocab = pieces.map(_.piece).toSet
    val wantTokens = rawPieces.flatMap(p =>
      if (vocab(p)) List(p)
      else p.getBytes("UTF-8").map(b => f"<0x${b & 0xff}%02X>").toList)
    val wantMixedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(wantTokens.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(encMixed(0).getLong(1) === wantTokens.length.toLong)
    assert(encMixed(0).getString(2) === wantMixedMd5)
  }
}
