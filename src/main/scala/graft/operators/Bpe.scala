package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Distributed byte-pair-encoding tokenizer training — the tokenizer
  * half of the pretraining pipeline (the corpus side is token_counts'
  * BPE-ish regex; this learns the ACTUAL merge table). Algorithm is
  * Sennrich-style word-level BPE (arXiv:1508.07909): symbols start as
  * characters + a terminal `</w>`, and each round merges the globally
  * most frequent adjacent symbol pair, greedy left-to-right within a
  * word.
  *
  * The 100 TB shape: the corpus is scanned ONCE, collapsing into the
  * (word, count) dictionary — Zipf-bounded vocabulary scale (~1e8
  * distinct words for web-scale text, vs ~1e13 corpus tokens). Every
  * merge round then runs over the dictionary only: one map-side-
  * combined pair-count aggregate + a 1-row argmax collect (the bounded
  * driver state, same bargain as the k-means codebook) + a per-word
  * merge map. Rounds localCheckpoint the dictionary so plan depth and
  * lineage stay flat, releasing the previous round's blocks (the
  * Dedup.clusters loop discipline). [[train]] is the honest unbatched
  * algorithm — ONE merge per Spark round, the reference semantics the
  * whole BPE oracle family is pinned to; a 32k-merge production
  * vocabulary under it is 32k sequential Spark rounds (the
  * training-side scale bound, r14 VERDICT #1). [[trainBatched]] is
  * the production trainer: top-K non-conflicting merges per round, so
  * the round count collapses to ≈ nMerges / K (measured in
  * BpeScaleTime) — see its scaladoc for the conflict rule and the
  * honest equivalence class vs the unbatched table.
  *
  * Not oracle-expressible: the greedy merge fold is inherently
  * sequential per word (DuckDB `replace` cannot reproduce greedy
  * adjacent-pair semantics on consecutive occurrences), so these are
  * rows-only queries — the spec instead proves bit-exact equality of
  * the full merge table against an independent in-memory reference
  * implementation.
  *
  * SCRIPT SCOPE (r14, pinned in TokenizerScopeSpec): pre-tokenization
  * is `\s+`, so scriptio-continua text (CJK etc.) collapses to
  * whole-sentence dictionary "words" — training still works (symbols
  * are code points; merges learn CJK pairs; the astral plane is
  * handled as code points, spec-pinned), but the dictionary becomes
  * SENTENCE-scale instead of Zipf-word-scale, which erodes the
  * scan-once-then-vocabulary-scale bargain above. A deployment
  * ingesting such scripts segments upstream (or uses byte-level
  * pre-tokenization — the SentencePiece/GPT-2 convention) before this
  * trainer. Unseen words at apply time are benign by construction:
  * symbols are substrings of the word itself, so nothing is ever
  * out-of-vocabulary.
  */
object Bpe {

  /** Lowercased whitespace word stream — the same normalization as the
    * tf-idf/vocabulary family, so dictionaries line up across operators.
    */
  private def docWords(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")

  /** The corpus collapsed to its word dictionary — the ONLY data-scale
    * stage of training.
    */
  def wordCounts(documents: DataFrame): DataFrame =
    docWords(documents).groupBy("word").agg(count(lit(1)).as("n"))

  /** word → initial symbol sequence: characters, then the end-of-word
    * marker as its own symbol (so merges can learn word-final units).
    */
  private def initialSymbols(word: Column): Column =
    concat(filter(split(word, ""), s => s =!= ""), array(lit("</w>")))

  /** word → initial BYTE-LEVEL symbol sequence (r14): the word's
    * UTF-8 bytes as `<0xNN>` tokens + the terminal marker — a
    * byte-level base alphabet (GPT-2-style closed 256-byte space,
    * SentencePiece `<0xNN>` token convention; NOT GPT-2's
    * bytes_to_unicode printable remap, so merge tables are not
    * artifact-compatible with GPT-2's — r14 ADVICE). The base
    * alphabet is the CLOSED
    * 256-token byte space, so every script is trainable and nothing
    * is ever out-of-vocabulary at apply time: the full fix for the
    * char-level coverage scope (see the object scaladoc's script
    * note), at the cost of longer initial sequences (a CJK char is 3
    * symbols before merges learn it back). Codegen'd HOF over the
    * encoded binary — no UDF.
    */
  private def initialSymbolsBytes(word: Column): Column = {
    val b = org.apache.spark.sql.functions.encode(word, "UTF-8")
    concat(
      transform(graft.functions.ColUtil.posRange(octet_length(b)),
        i => concat(lit("<0x"), upper(hex(b.substr(i, lit(1)))), lit(">"))),
      array(lit("</w>")))
  }

  private def initialSyms(word: Column, byteLevel: Boolean): Column =
    if (byteLevel) initialSymbolsBytes(word) else initialSymbols(word)

  /** Adjacent symbol pairs of a word (every occurrence counts, the
    * standard BPE statistic — "aaa" contributes (a,a) twice).
    */
  private def adjacentPairs(syms: Column): Column =
    zip_with(slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** Greedy left-to-right application of one merge (l, r) → l+r as a
    * declarative fold: the accumulator carries (emitted symbols,
    * pending symbol); a pending `l` meeting an `r` emits the merged
    * symbol and clears, anything else flushes the pending and takes
    * over. Stays a codegen'd HOF pipeline — per-word sequential logic
    * WITHOUT a UDF. ("aaa" + (a,a) → [aa, a], the Sennrich scan.)
    */
  private def applyMerge(syms: Column, l: String, r: String): Column = {
    val init = struct(
      array().cast(ArrayType(StringType)).as("out"),
      lit(null).cast(StringType).as("pend"))
    aggregate(syms, init,
      (acc, s) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend.isNull, struct(out.as("out"), s.as("pend")))
          .when(pend === lit(l) && s === lit(r),
            struct(concat(out, array(lit(l + r))).as("out"),
              lit(null).cast(StringType).as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"), s.as("pend")))
      },
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend")))))
  }

  /** One learned merge: rank order, the pair, its count at merge time. */
  final case class Merge(rank: Long, lhs: String, rhs: String,
                         merged: String, pair_count: Long)

  /** The training loop. Returns the merge list (driver-bounded:
    * nMerges rows) and the final checkpointed dictionary with its
    * trained symbol sequences — the caller owns releasing the
    * checkpoint (ColumnBridge.unpersistCheckpoint) once done.
    * Ties in the argmax break on (count desc, lhs, rhs) — binary
    * UTF-8 string order, deterministic across runs and cluster sizes.
    * Training stops early when no pair occurs twice (merging a
    * count-1 pair can never help a tokenizer).
    *
    * SCALE BOUND (r14 VERDICT #1): one merge costs one Spark round
    * (pair-count aggregate + argmax collect + checkpoint), so a
    * production 32k-merge vocabulary is 32k SEQUENTIAL rounds —
    * train-once/encode-forever holds on the apply side (the merge
    * table rides as one expression reference object), but the
    * training side of this overload is fixture/exploration scale.
    * Production training is [[trainBatched]] (top-K non-conflicting
    * merges per round, rounds ≈ nMerges / K); this unbatched form is
    * the reference semantics every oracle and the batched trainer's
    * equivalence spec are pinned against.
    */
  def train(documents: DataFrame, nMerges: Int = 16,
            byteLevel: Boolean = false): (Seq[Merge], DataFrame) = {
    // r17 optimization: delegate to the batched trainer at K = 1 —
    // spec-pinned ("batched K=1 degenerates to the unbatched trainer
    // exactly") to produce the IDENTICAL merge table and dictionary,
    // while running ONE Spark round per merge (constant-size plan, no
    // per-round checkpoint job) instead of two. The historical
    // incremental implementation stays below as the reference
    // semantics the equivalence spec compares against.
    val (m, words, _) = trainBatched(documents, nMerges, 1, byteLevel)
    (m, words)
  }

  private[graft] def trainUnbatchedReference(
      documents: DataFrame, nMerges: Int = 16,
      byteLevel: Boolean = false): (Seq[Merge], DataFrame) = {
    var words = wordCounts(documents)
      .select(col("word"), col("n"),
        initialSyms(col("word"), byteLevel).as("syms"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var continue = true
    while (continue && learned.size < nMerges) {
      val top = words
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("n"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2L) continue = false
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += Merge(learned.size + 1L, l, r, l + r, c)
        val next = words.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
        org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(words)
        words = next
      }
    }
    (learned.toSeq, words)
  }

  /** The learned merge table as a DataFrame — the artifact a tokenizer
    * ships (rank-ordered; applying merges in rank order re-derives the
    * trained dictionary).
    */
  def merges(documents: DataFrame, nMerges: Int = 16,
             byteLevel: Boolean = false): DataFrame = {
    val (learned, words) = train(documents, nMerges, byteLevel)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(words)
    val spark = documents.sparkSession
    import spark.implicits._
    learned.toDF().orderBy("rank")
  }

  /** BATCHED greedy training — the production trainer (r14 VERDICT
    * #1: [[train]] runs one Spark round PER merge, so a 32k-merge
    * vocabulary is 32k sequential rounds; here it is ≈ 32k / K).
    *
    * Per round: ONE pair-count aggregate over the dictionary, ONE
    * bounded top-candidate collect (≤ 8·K + 8 rows — driver state
    * stays codebook-scale), then the candidates are walked in the
    * same global order the unbatched argmax uses (count desc, lhs,
    * rhs — binary UTF-8, deterministic) and greedily accepted into
    * the batch under the CONFLICT RULE: a candidate (l, r) is
    * accepted iff neither l nor r appears among the lhs/rhs/merged
    * symbols of any merge already accepted THIS round (skipped
    * candidates are not lost — the next round's full recount sees
    * them). Accepted merges get consecutive ranks in acceptance
    * order and are applied together in rank order before the next
    * recount.
    *
    * WHY the rule makes within-batch counts exact: merging (l1, r1)
    * → m1 rewrites `… x l1 r1 y …` to `… x m1 y …` — it destroys
    * only pairs touching l1/r1 and creates only pairs touching m1.
    * A later batch member (l2, r2) with {l2, r2} disjoint from
    * {l1, r1, m1} therefore has its occurrence set untouched, so the
    * pre-round count recorded in its [[Merge]] row equals what the
    * unbatched recount would have measured.
    *
    * THE HONEST EQUIVALENCE CLASS (spec: BpeSpec batched section):
    * the batched table is IDENTICAL to [[train]]'s — ranks, pairs,
    * counts — whenever, within each round, (a) no candidate is
    * conflict-skipped ahead of an accepted one, and (b) no pair
    * CREATED by an accepted merge outranks a later batch member.
    * Both failure modes are scheduling divergences, not count
    * errors: (a) defers a pair one round (its recount value is
    * unchanged by disjointness); (b) means the unbatched trainer
    * would have interleaved a brand-new pair (e.g. learning `th`
    * then immediately `the`) where the batch finishes its
    * already-selected members first. The spec pins a fixture for
    * the equality case AND a divergence fixture for each mode,
    * each verified against an independent in-memory batched
    * reference.
    *
    * Plan shape: the base (word, n) dictionary is checkpointed ONCE;
    * every round re-derives symbols from the word via the native
    * [[graft.functions.BpeApplyMerges]] expression carrying all
    * merges learned so far as a reference object — plan size is
    * CONSTANT in the merge count (no per-round checkpoint, no
    * lineage growth; the r14 apply fix reused on the training side).
    * Returns (merges, final dictionary view, rounds run); the caller
    * releases the checkpoint via the returned DataFrame's base
    * (ColumnBridge.unpersistCheckpoint on the dictionary) when done.
    */
  def trainBatched(documents: DataFrame, nMerges: Int = 16,
                   batchK: Int = 16, byteLevel: Boolean = false)
      : (Seq[Merge], DataFrame, Int) = {
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    val base = wordCounts(documents).localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    def symsCol: Column = graft.functions.TextExpressions
      .bpeApplyMerges(col("word"), learned.toSeq.map(m => (m.lhs, m.rhs)),
        byteLevel)
    var rounds = 0
    var continue = true
    while (continue && learned.size < nMerges) {
      // candidate cap: enough slack that heavy conflict-skipping can
      // still fill the batch, still bounded driver state
      val cap = 8 * batchK + 8
      val cands = base
        .select(explode(adjacentPairs(symsCol)).as("p"), col("n"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum(col("n")).as("cnt"))
        .filter(col("cnt") >= 2L)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(cap).collect()
      rounds += 1
      if (cands.isEmpty) continue = false
      else {
        val used = scala.collection.mutable.HashSet.empty[String]
        val want = math.min(batchK, nMerges - learned.size)
        var accepted = 0
        var i = 0
        while (i < cands.length && accepted < want) {
          val (l, r, c) = (cands(i).getString(0), cands(i).getString(1),
            cands(i).getLong(2))
          if (!used(l) && !used(r)) {
            learned += Merge(learned.size + 1L, l, r, l + r, c)
            used += l; used += r; used += (l + r)
            accepted += 1
          }
          i += 1
        }
      }
    }
    (learned.toSeq, base.select(col("word"), col("n"), symsCol.as("syms")),
      rounds)
  }

  /** [[merges]] under the batched trainer — the production artifact
    * path. Same schema; ranks are batch-acceptance order (identical
    * to the unbatched table inside the equivalence class above).
    */
  def mergesBatched(documents: DataFrame, nMerges: Int = 16,
                    batchK: Int = 16, byteLevel: Boolean = false): DataFrame = {
    val (learned, words, _) = trainBatched(documents, nMerges, batchK, byteLevel)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(words)
    val spark = documents.sparkSession
    import spark.implicits._
    learned.toDF().orderBy("rank")
  }

  /** [[encode]] under the batched trainer: train batched, then the
    * standard positional-reassembly apply — the end-to-end production
    * train→encode path (full oracle via the batched dump-time
    * dictionary, SparkEntry.bpeBatchedDictValues).
    */
  def encodeBatched(documents: DataFrame, nMerges: Int = 16,
                    batchK: Int = 16, byteLevel: Boolean = false): DataFrame = {
    val (m, words) = {
      val (m0, w0, _) = trainBatched(documents, nMerges, batchK, byteLevel)
      (m0, w0)
    }
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(words)
    encodeWith(documents, m, byteLevel)
  }

  /** Per-doc BPE token counts under the trained merges — the
    * "what does this tokenizer cost per document" statistic (feeds
    * pack planning / budget selection with real token counts instead
    * of the whitespace proxy). The trained dictionary maps word →
    * symbol count; docs re-explode to words and join that map — salted
    * on the word key (the tf-idf discipline: a raw join key would put
    * every "the" row in one reducer).
    */
  /** Per-doc ENCODED token stream under the trained merges — the apply
    * step a dataloader runs after training (merges/tokenCounts publish
    * the artifact and its cost; this materializes the tokens). Words
    * re-explode WITH position, join the trained word → symbols
    * dictionary salted on the word key (the tokenCounts discipline),
    * and each doc reassembles its stream by sorting the collected
    * (pos, syms) structs — order restored deterministically, no window.
    * Published as token count + an md5 digest over the
    * space-joined stream (the engine-exact digest convention; a raw
    * token array column would dominate output bytes at corpus scale).
    * Per-group memory is one document's symbol list — bounded by doc
    * length, the same envelope the pack writer already assumes.
    * Rows-only like the rest of the BPE family; the spec proves every
    * digest equal to the independent in-memory reference encoder.
    */
  def encode(documents: DataFrame, nMerges: Int = 16,
             byteLevel: Boolean = false): DataFrame = {
    val (_, words) = train(documents, nMerges, byteLevel)
    val docWordsPos = documents
      .select(col("doc_id"), posexplode(split(lower(trim(col("text"))), "\\s+")))
      .toDF("doc_id", "pos", "word")
      .filter(col("word") =!= "")
    Partitioning
      .saltedEquiJoin(docWordsPos, words.select(col("word"), col("syms")),
        "word", col("doc_id"))
      .groupBy("doc_id")
      .agg(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("syms")))),
          s => s.getField("syms"))).as("tokens"))
      .select(col("doc_id"),
        size(col("tokens")).cast(LongType).as("n_tokens"),
        md5(concat_ws(" ", col("tokens")).cast("binary")).as("token_md5"))
      .orderBy("doc_id")
  }

  def tokenCounts(documents: DataFrame, nMerges: Int = 16): DataFrame = {
    val (_, words) = train(documents, nMerges)
    val sizes = words.select(col("word"), size(col("syms")).cast(LongType).as("n_syms"))
    val counts = Partitioning
      .saltedEquiJoin(docWords(documents), sizes, "word", col("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_bpe_tokens"))
      .orderBy("doc_id")
    counts
  }

  /** Per-language tokenizer FERTILITY report (Rust et al. 2021, "How
    * Good is Your Tokenizer?"): fertility = subword tokens per word,
    * the multilingual-fairness metric a shared tokenizer is audited
    * by (a language whose words shatter into many pieces pays more
    * sequence length for the same content), plus chars-per-token (the
    * compression view of the same imbalance). Both are one double
    * division of exact corpus-total longs — engine-parity by the
    * integer-sums discipline. Token counts are MARKER-INCLUSIVE (the
    * Sennrich terminal `</w>` is a symbol like any other — n_syms =
    * chars + 1 − merges applied), so chars_per_token can dip below 1
    * at low merge counts; fertility comparisons across languages are
    * unaffected (every word carries exactly one marker).
    *
    * Scale shape: [[tokenCounts]]'s salted word join (the dictionary
    * side is vocabulary-scale), then a ≤|langs|-key aggregate with
    * map-side partials.
    */
  def fertility(documents: DataFrame, nMerges: Int = 16): DataFrame = {
    val (_, words) = train(documents, nMerges)
    val sizes = words.select(col("word"), size(col("syms")).cast(LongType).as("n_syms"))
    Partitioning
      .saltedEquiJoin(docWords(documents), sizes, "word", col("doc_id"))
      .join(documents.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy("lang")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_bpe_tokens"),
        sum(length(col("word")).cast(LongType)).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"), col("n_chars"),
        (col("n_bpe_tokens").cast("double") / col("n_words")).as("fertility"),
        (col("n_chars").cast("double") / col("n_bpe_tokens")).as("chars_per_token"))
      .orderBy("lang")
  }

  /** The inverse of [[merges]]: read a persisted merge-table artifact
    * (rank, lhs, rhs, merged, pair_count — e.g. the parquet a
    * `merges().write.parquet(...)` landed) back into the [[Merge]]
    * sequence the apply overloads take — closing the train → persist
    * → load → encode deployment loop. Rows are re-sorted by rank
    * (application order IS the contract), so storage order is
    * irrelevant. Bounded collect: nMerges rows by construction.
    */
  def mergesFrom(mergesDf: DataFrame): Seq[Merge] =
    mergesDf.select("rank", "lhs", "rhs", "merged", "pair_count").collect()
      .map(r => Merge(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .sortBy(_.rank).toSeq

  /** word → trained symbol sequence under a PRE-TRAINED merge table —
    * the apply-only half of the train-once/encode-forever deployment
    * split (the kmeansAssignWith pattern, r12 VERDICT #3): the rank-
    * ordered merge list applies over the NEW corpus's own word
    * dictionary, so unseen words segment correctly (each merge fires
    * exactly where training would have fired it — per-word greedy
    * application is history-free, which is why the composed apply
    * equals [[train]]'s checkpointed rounds). ONE map-only stage over
    * the dictionary: no pair-count aggregate, no argmax collect, no
    * checkpoint round — building this plan launches ZERO Spark jobs
    * (spec-asserted), where the self-training path runs 2·nMerges+1
    * driver-visible jobs before the first apply.
    *
    * PRODUCTION merge counts (r13 VERDICT #2): the merge table rides
    * as ONE native expression's reference object
    * ([[graft.functions.BpeApplyMerges]]) — plan size and generated
    * code are CONSTANT in nMerges, where the previous nMerges-nested
    * [[applyMerge]] fold chain grew the plan linearly and would blow
    * the Janino 64KB method limit at SentencePiece/GPT-scale
    * vocabularies (30k+ merges). The fold form is retained as
    * [[applyTrainedWordsFold]]; the spec proves frame equality and
    * BpeScaleTime measures both at ≥1k merges.
    */
  private[graft] def applyTrainedWords(documents: DataFrame,
                                        merges: Seq[Merge],
                                        byteLevel: Boolean = false): DataFrame =
    wordCounts(documents).select(col("word"),
      graft.functions.TextExpressions.bpeApplyMerges(col("word"),
        merges.map(m => (m.lhs, m.rhs)), byteLevel).as("syms"))

  /** The pre-r14 nested-fold apply — kept as the frame-equality
    * reference for [[applyTrainedWords]]' native expression (and as
    * the measured baseline in BpeScaleTime: plan depth linear in the
    * merge count, the documented scale bound the expression removes).
    */
  private[graft] def applyTrainedWordsFold(documents: DataFrame,
                                            merges: Seq[Merge],
                                            byteLevel: Boolean = false): DataFrame =
    wordCounts(documents).select(col("word"),
      merges.foldLeft(initialSyms(col("word"), byteLevel))(
        (syms, m) => applyMerge(syms, m.lhs, m.rhs)).as("syms"))

  /** [[encode]] under a pre-trained merge table: identical output to
    * the self-training form on the training corpus (spec: frame
    * equality), zero training jobs on any corpus. Supported at
    * production artifact sizes: the merge table is an expression
    * reference object, so plan size, codegen, and per-word skip cost
    * are flat in the merge count (see [[applyTrainedWords]]).
    */
  def encodeWith(documents: DataFrame, merges: Seq[Merge],
                 byteLevel: Boolean = false): DataFrame = {
    val words = applyTrainedWords(documents, merges, byteLevel)
    val docWordsPos = documents
      .select(col("doc_id"), posexplode(split(lower(trim(col("text"))), "\\s+")))
      .toDF("doc_id", "pos", "word")
      .filter(col("word") =!= "")
    Partitioning
      .saltedEquiJoin(docWordsPos, words.select(col("word"), col("syms")),
        "word", col("doc_id"))
      .groupBy("doc_id")
      .agg(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("syms")))),
          s => s.getField("syms"))).as("tokens"))
      .select(col("doc_id"),
        size(col("tokens")).cast(LongType).as("n_tokens"),
        md5(concat_ws(" ", col("tokens")).cast("binary")).as("token_md5"))
      .orderBy("doc_id")
  }

  /** [[tokenCounts]] under a pre-trained merge table — the apply-only
    * twin ([[encodeWith]]'s size projection).
    */
  def tokenCountsWith(documents: DataFrame, merges: Seq[Merge]): DataFrame = {
    val sizes = applyTrainedWords(documents, merges)
      .select(col("word"), size(col("syms")).cast(LongType).as("n_syms"))
    Partitioning
      .saltedEquiJoin(docWords(documents), sizes, "word", col("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }
}
