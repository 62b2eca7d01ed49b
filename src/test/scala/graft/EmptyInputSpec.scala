package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Degenerate-input robustness: every core operator must handle an
  * EMPTY input without failing — at cluster scale empty partitions,
  * empty incremental batches, and freshly-truncated tables are routine,
  * and an operator that NPEs on them kills the job.
  */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  private def empty(schema: StructType) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))
  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("ts", TimestampType),
    StructField("value", DoubleType), StructField("props", StringType)))
  private val orderSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))
  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  test("text/dedup operators survive an empty corpus") {
    val docs = empty(docSchema)
    assert(Dedup.exact(docs).count() === 0)
    assert(Dedup.minhashPairs(docs).count() === 0)
    assert(Dedup.jaccardTop(docs).count() === 0)
    assert(Dedup.simhash(docs).count() === 0)
    assert(TextOps.textStats(docs).count() === 0)
    assert(TextOps.langId(docs).count() === 0)
    assert(TextOps.repetition(docs).count() === 0)
    assert(TextOps.decontaminate(docs).count() === 0)
    assert(TextOps.decontaminateBloom(docs).count() === 0,
      "empty eval set → all-zero bloom, zero rows, no throw")
    assert(TextOps.decontaminateIncremental(docs, docs).count() === 0)
    assert(TextOps.contaminationMatrix(docs).count() === 0)
    assert(TextOps.vocabulary(docs).count() === 0)
    assert(TextOps.ngramNovelty(docs).count() === 0)
    assert(TextOps.ngramNoveltyIncremental(docs, docs).count() === 0)
    assert(TextOps.qualityGate(docs).count() === 0)
    assert(TextOps.qualityVerdict(docs).count() === 0)
    assert(TextOps.passageScrub(docs).count() === 0)
    // ExactSubstr family (r15): empty corpus → zero spans; scrub and
    // summary of an empty corpus are empty, not a throw
    assert(TextOps.repeatedSpans(docs).count() === 0)
    assert(TextOps.repeatedSpansIncremental(docs, docs).count() === 0)
    assert(TextOps.repeatedSpanScrub(docs).count() === 0)
    assert(TextOps.repeatedSpansSummary(docs).count() === 0)
    // the funnel still reports its four stages, all zero
    val funnel = TextOps.corpusFunnel(docs).collect()
    assert(funnel.length === 4 && funnel.forall(_.getLong(2) === 0L))
    // image dHash family (r15): empty corpus → zero signatures, zero
    // candidate pairs, no throw
    assert(Multimodal.imageDHashSignatures(spark, docs).count() === 0)
    assert(Multimodal.imageNearDup(spark, docs).count() === 0)
    assert(Multimodal.imageAdmit(spark,
      Multimodal.imageDHashSignatures(spark, docs), docs).count() === 0)
    // audio fingerprint family (r15): empty corpus → zero windows,
    // zero candidate pairs
    assert(Multimodal.audioFingerprints(docs).count() === 0)
    assert(Multimodal.audioNearDup(docs).count() === 0)
  }

  test("corpus-construction operators survive an empty corpus") {
    val docs = empty(docSchema)
    // the propagation loop must detect the empty fixpoint in one round
    assert(Dedup.clusters(docs).count() === 0)
    assert(Dedup.prune(docs).count() === 0)
    assert(Corpus.sample(docs).count() === 0)
    assert(Corpus.mixSummary(docs).count() === 0)
    assert(Corpus.stratifiedSample(docs).count() === 0)
    assert(Corpus.packPlan(docs).count() === 0)
    assert(Corpus.packPlanShuffled(docs).count() === 0)
    assert(Corpus.packSummary(docs).count() === 0)
    assert(Corpus.piiScrub(docs).count() === 0)
    assert(Corpus.tfidfTopTerms(docs).count() === 0)
    assert(Dedup.containmentTop(docs).count() === 0)
    assert(Corpus.bm25TopDocs(docs).count() === 0)
    assert(Corpus.bm25Batch(docs).count() === 0)
    assert(TextOps.vocabHllRegisters(docs).count() === 0)
    // empty corpus: one summary row, estimate 0 (all-zero registers →
    // linear counting of V=m → 256·log2(1)·ln2 = 0), exact 0
    val hll = TextOps.vocabHll(docs).collect()
    assert(hll.length === 1 && hll(0).getLong(3) === 0L && hll(0).getLong(4) === 0L)
    assert(Corpus.prioritySample(docs).count() === 0)
    assert(Corpus.zipfSlope(docs).count() === 0)
    assert(Corpus.sourceOverlap(docs).count() === 0)
    assert(Corpus.capPerSource(docs).count() === 0)
    assert(Corpus.capPerSourceIncremental(docs, Corpus.capPerSource(docs))
      .count() === 0)
    assert(TextOps.bigramLogloss(docs).count() === 0)
    assert(TextOps.bigramLoglossIncremental(docs,
      TextOps.bigramCounts(docs), TextOps.termCounts(docs)).count() === 0)
    // stupid-backoff trigram family (r16): empty batch and/or empty
    // model (null totals) → zero rows, no throw
    assert(TextOps.trigramBackoff(docs, docs).count() === 0)
    assert(TextOps.trigramBackoffSummary(docs, docs).count() === 0)
    // DSIR family (r16): empty corpus → empty models (null totals
    // stay unevaluated — the contribution table has no rows)
    assert(Corpus.dsirWeights(docs, col("lang") === "en").count() === 0)
    assert(Corpus.dsirSelect(docs, col("lang") === "en").count() === 0)
    assert(Corpus.dsirSelectGumbel(docs, col("lang") === "en").count() === 0)
    assert(Corpus.dsirWeightsIncremental(docs, col("lang") === "en",
      Corpus.dsirBucketCounts(docs), Corpus.dsirBucketCounts(docs))
      .count() === 0)
    // UniMax apply (r17): empty corpus → empty allocation → empty
    // selection, no throw
    assert(Corpus.unimaxSelect(docs).count() === 0)
    assert(Corpus.report(docs).count() === 0)
    assert(Corpus.packManifest(docs).count() === 0)
    assert(Corpus.packSequences(docs).count() === 0)
    assert(Corpus.selectBudget(docs).count() === 0,
      "no histogram → no thresholds → zero rows, no throw")
    assert(Corpus.curate(docs).count() === 0)
    assert(Corpus.curate(docs, selector = "priority").count() === 0,
      "empty survivor frame → empty reservoir, no throw")
    assert(Corpus.temperatureSample(docs).count() === 0, "min over no langs must not throw")
    assert(Corpus.temperatureSummary(docs).count() === 0)
    assert(Corpus.shufflePlan(docs).count() === 0)
    assert(Corpus.interleave(docs).count() === 0,
      "empty vt span (min=max=0) must not throw")
    assert(Bpe.merges(docs).count() === 0, "no pairs → zero merges, no throw")
    assert(Bpe.tokenCounts(docs).count() === 0)
    assert(Bpe.encode(docs).count() === 0)
    // batched trainer (r15): empty dictionary → one empty candidate
    // round → zero merges, no throw
    assert(Bpe.mergesBatched(docs).count() === 0)
    assert(Bpe.encodeBatched(docs).count() === 0)
    // pre-trained apply overloads (r13): empty corpus under any
    // artifact, and an empty artifact against a live corpus
    assert(Bpe.encodeWith(docs, Seq.empty).count() === 0)
    assert(Bpe.tokenCountsWith(docs, Seq.empty).count() === 0)
    assert(UnigramLm.train(docs).isEmpty, "empty corpus → empty piece table")
    assert(UnigramLm.train(docs, softEm = true).isEmpty)
    assert(UnigramLm.vocab(docs).count() === 0)
    assert(UnigramLm.vocabSoftEm(docs).count() === 0)
    assert(UnigramLm.vocabLossPruned(docs).count() === 0)
    assert(UnigramLm.tokenCounts(docs).count() === 0)
    assert(UnigramLm.encode(docs).count() === 0)
    assert(UnigramLm.encodeWith(docs, Seq.empty).count() === 0)
    assert(UnigramLm.tokenCountsWith(docs, Seq.empty).count() === 0)
    // an empty corpus trains the zero model (null gradients → no update)
    val model = Classifier.train(docs).collect()
    assert(model.length === Classifier.featureNames.size)
    assert(model.forall(_.getDouble(1) === 0.0))
    assert(Classifier.score(docs).count() === 0)
    assert(Corpus.curriculum(docs).count() === 0,
      "stage div by n_docs=0 must not throw on zero rows")
    assert(Dedup.incremental(docs, docs).count() === 0)
    assert(Dedup.incrementalNearDup(docs, docs).count() === 0)
    assert(Dedup.admitNearDup(docs, docs).count() === 0)
    // empty corpus, non-empty batch: everything is admitted
    import spark.implicits._
    val batch = Seq((1L, "some arriving text", "en", "src0", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // an EMPTY artifact against a live corpus: BPE falls back to char
    // symbols (no vocab contract); unigram returns zero rows (coverage
    // contract violated — the guarded empty-dictionary convention)
    assert(Bpe.encodeWith(batch, Seq.empty).count() === 1)
    assert(UnigramLm.encodeWith(batch, Seq.empty).count() === 0)
    assert(Dedup.incremental(docs, batch).count() === 1)
    assert(Dedup.admitNearDup(docs, batch).count() === 1)
    // empty batch against a standing corpus: nothing admitted, no throw
    assert(Dedup.admitNearDup(batch, docs).count() === 0)
    // incremental pack planning: empty offsets table and empty batch
    val noOffsets = Seq.empty[(String, Long)].toDF("lang", "base_tokens")
    assert(Corpus.packPlanIncremental(docs, noOffsets).count() === 0)
    assert(Corpus.packPlanIncremental(batch, noOffsets).count() === 1)
  }

  test("event operators survive an empty stream") {
    val ev = empty(eventSchema)
    assert(EventOps.sessionize(ev).count() === 0)
    assert(EventOps.sessionWindows(ev).count() === 0)
    assert(EventOps.dedupLatest(ev).count() === 0)
    assert(EventOps.heavyHittersCms(ev).count() === 0)
    assert(EventOps.dauHll(ev).count() === 0)
    assert(EventOps.newVsReturning(ev).count() === 0)
    assert(EventOps.slidingActivity(ev).count() === 0)
  }

  test("dims/facts survive empty sources") {
    val orders = empty(orderSchema)
    assert(Dims.dimDate(orders).count() === 0)
    assert(Dims.scd2Customer(orders).count() === 0)
    assert(Dims.dimFiscalPeriod(orders).count() === 0, "empty span → no periods")
    assert(Facts.factBalance(orders).count() === 0)
    assert(Analytics.cohortRetention(orders).count() === 0)
    assert(Analytics.rfmSegments(orders).count() === 0)
    assert(Analytics.basketPairs(empty(StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType))))).count() === 0)
    assert(Validation.distributionDrift(orders, orders).count() === 0,
      "empty union → null bounds → zero bins, no throw")
    assert(Validation.benfordTotalprice(orders).count() === 0)
    assert(Analytics.customerOrderDistribution(
      empty(StructType(Seq(StructField("c_custkey", LongType)))), orders).count() === 0)
  }

  test("similarity operators survive an empty embedding corpus") {
    val emb = empty(embSchema)
    assert(Similarity.knnBrute(emb).count() === 0)
    assert(Similarity.knnLsh(emb).count() === 0)
    assert(Similarity.annRecall(emb).count() === 0)
    assert(Similarity.embeddingNearDup(emb).count() === 0)
    assert(Similarity.labelCentroids(emb).count() === 0)
    assert(Similarity.knnIvf(emb).count() === 0, "empty codebook must not throw")
    assert(Similarity.quantize(emb).count() === 0)
    assert(Similarity.kmeansAssign(emb).count() === 0,
      "empty corpus → empty codebook, zero rows, no throw")
    assert(Similarity.kmeansCentroids(emb).count() === 0)
    assert(Similarity.embeddingNearDupIvf(emb).count() === 0)
    // SemDeDup (r16): empty corpus → empty codebook, zero components,
    // zero summary cells, no throw
    assert(Similarity.semdedup(emb).count() === 0)
    assert(Similarity.semdedupSummary(emb).count() === 0)
    // semantic admission + graph ANN (r17): empty corpus → empty
    // codebook/index/graph, zero rows everywhere, no throw
    val emptyCode = Similarity.kmeansCodebook(emb, 8, 3)
    assert(Similarity.semdedupIndex(emb, emptyCode).count() === 0)
    assert(Similarity.semdedupAdmit(emb, emb, emptyCode).count() === 0)
    assert(Similarity.knnGraph(emb).count() === 0)
    assert(Similarity.annRecallGraph(emb).count() === 0)
    assert(Similarity.graphOperatingCurve(emb).count() === 0)
    assert(Similarity.annFamilyComparison(emb).count() === 0)
    assert(Similarity.pqCodes(emb).count() === 0,
      "empty corpus → empty subspace codebooks, zero rows, no throw")
    assert(Similarity.knnPq(emb).count() === 0)
    assert(Similarity.knnSqInt8(emb).count() === 0)
    assert(Similarity.knnIvfPq(emb).count() === 0)
    assert(Similarity.knnIvfPqResidual(emb).count() === 0)
    assert(Similarity.knnIvfKmeans(emb).count() === 0,
      "empty Lloyd codebook → zero rows, no throw")
    // pretrained composed artifact (r15): the empty-corpus artifact is
    // identity rotation + empty codebooks; searching with it on the
    // empty corpus returns zero rows, no throw
    val art = Similarity.trainIvfPqResidualOpqArtifact(emb)
    assert(art.coarse.isEmpty && art.books.forall(_.isEmpty))
    assert(Similarity.knnIvfPqResidualOpqWith(emb, art).count() === 0)
    assert(Similarity.annRecallIvfPqResidualOpqWith(emb, art).count() === 0)
    assert(Similarity.decontaminateEmbedding(emb).count() === 0)
    assert(Similarity.covariance(emb).count() === 0)
    assert(Similarity.pcaComponent(emb).count() === 0,
      "empty corpus → no covariance cells, empty component, no throw")
    assert(Similarity.pcaProject(emb).count() === 0)
    assert(Similarity.covarianceIncremental(emb, emb).count() === 0)
    assert(Similarity.pcaComponents(emb).count() === 0)
    assert(Similarity.randomProject(emb).count() === 0)
    // operating curves (r13): empty corpus → empty codebooks and an
    // empty truth side — zero rows, no throw
    assert(Similarity.annOperatingCurve(emb).count() === 0)
    assert(Similarity.lshOperatingCurve(emb).count() === 0)
    assert(Similarity.annOperatingCurveIvfPq(emb).count() === 0)
    // the learned-rotation trainer on an empty corpus returns the
    // identity basis (documented fallback), never throws
    val rows = Similarity.opqLearnedRotationRows(emb)
    assert(rows.length === 64 && rows(0)(0) === 1.0 && rows(0)(1) === 0.0)
  }

  test("profiling operators survive empty tables") {
    val orders = empty(orderSchema)
    assert(Validation.tableProfile(orders).collect()
      .forall(r => r.getLong(1) === 0), "zero rows per column")
    assert(Validation.columnHistogram(orders, "o_totalprice").count() === 0)
  }

  test("snapshot diff survives empty snapshots on either side") {
    val orders = empty(orderSchema)
    val keys = Seq("o_orderkey")
    val cmp = Seq("o_orderstatus", "o_orderpriority")
    assert(Validation.snapshotDiff(orders, orders, keys, cmp).count() === 0)
    import spark.implicits._
    val one = Seq((1L, 1L, "O", 10.0, new java.sql.Timestamp(0L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    // empty old → pure insert stream; empty new → pure delete stream
    assert(Validation.snapshotDiff(orders, one, keys, cmp)
      .collect().map(_.getString(1)).toSeq === Seq("I"))
    assert(Validation.snapshotDiff(one, orders, keys, cmp)
      .collect().map(_.getString(1)).toSeq === Seq("D"))
  }

  test("CDC apply survives empty change streams and empty sinks") {
    val ev = empty(eventSchema)
    // no changes: the standing fact passes through identically
    val fact = graft.operators.Facts.factTransactions(
      graft.sources.Tables.events(spark, sf))
    val noChange = Etl.maintainFactTransactions(fact,
      graft.sources.Tables.events(spark, sf))
    assert(noChange.exceptAll(fact).count() === 0)
    assert(fact.exceptAll(noChange).count() === 0)
    // empty sink + empty source snapshot: nothing, no throw
    val emptyFact = graft.operators.Facts.factTransactions(ev)
    assert(Etl.maintainFactTransactions(emptyFact, ev).count() === 0)
    // self-healing: a drifted sink row surfaces as a U and is repaired
    val drifted = fact.withColumn("n_events",
      when(col("user_id") === fact.first().getLong(0), lit(999999L))
        .otherwise(col("n_events")))
    val healed = Etl.maintainFactTransactions(drifted,
      graft.sources.Tables.events(spark, sf))
    assert(healed.exceptAll(fact).count() === 0)
    assert(fact.exceptAll(healed).count() === 0)
  }
}
