package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Similarity search over the embedding column (Array[Float], d=64).
  *
  * Vector math is expressed with higher-order functions
  * (zip_with + ordered aggregate fold) → stays in codegen, and the
  * left-to-right double fold is bit-reproducible across engines and
  * runs (a parallel/reassociated sum would not be).
  *
  * Scale paths: brute force broadcasts the (bounded) probe set and
  * streams the corpus — O(|corpus|·|probes|) flops, no corpus shuffle.
  * The LSH variant buckets by random-hyperplane signs so candidate
  * generation drops to bucket-local joins.
  */
object Similarity {

  /** Ordered left-to-right dot product in double (declarative HOF
    * form; kept as the portable reference implementation).
    */
  def vdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def vnorm(a: Column): Column = sqrt(vdot(a, a))

  /** Cosine via the native codegen'd Catalyst expression
    * (graft.functions.CosineSim) — single fused loop, no intermediate
    * arrays; bit-compatible with the HOF form (same accumulation order).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineSim(a, b)

  /** Exact top-k cosine neighbors for probes (vec_id < nProbes).
    * Probe side broadcast; corpus streamed once.
    */
  def knnBrute(embeddings: DataFrame, nProbes: Int = 20, k: Int = 5): DataFrame = {
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val corpus = embeddings.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    val scored = corpus.join(broadcast(probes), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos_sim")
      .orderBy("qid", "rank")
  }

  /** Random-hyperplane signature: bit p = sign of ⟨v, plane_p⟩ where
    * plane_p has deterministic ±1 coefficients derived from
    * md5("p:i"). Engine-free randomness → reproducible buckets.
    */
  def lshSignature(v: Column, nPlanes: Int = 8, dim: Int = 64): Column = {
    val bits = (0 until nPlanes).map { p =>
      val coefs = (1 to dim).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        if (hex.charAt(0) >= '8') 1.0 else -1.0
      }
      // dot(v, ±1 plane) = ordered sum of signed components
      val signed = aggregate(
        zip_with(v, lit(coefs.toArray), (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(signed > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** LSH-bucketed ANN: candidates share the full signature bucket; then
    * exact cosine within bucket, top-k per probe. Recall vs knnBrute is
    * asserted in the spec (rows-only correctness entry).
    */
  def knnLsh(embeddings: DataFrame, nProbes: Int = 20, k: Int = 5): DataFrame = {
    val withSig = embeddings.select(col("vec_id"), col("embedding"),
      lshSignature(col("embedding")).as("sig"))
    val probes = withSig.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("sig"))
    val corpus = withSig.select(col("vec_id").as("nid"),
      col("embedding").as("nv"), col("sig").as("nsig"))
    val scored = corpus.join(broadcast(probes),
        col("sig") === col("nsig") && col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos_sim")
      .orderBy("qid", "rank")
  }

  /** IVF-style ANN (training-free variant): the first `nCentroids`
    * vectors act as fixed coarse centroids; every corpus vector is
    * assigned to its nearest centroid's inverted list, probes search
    * their `probeLists` nearest lists only. Candidate generation is a
    * bucket join on list id — O(|corpus|·k/nLists) per probe instead of
    * O(|corpus|). Recall properties asserted in spec (rows-only entry).
    */
  def knnIvf(embeddings: DataFrame, nProbes: Int = 20, k: Int = 5,
             nCentroids: Int = 16, probeLists: Int = 2): DataFrame = {
    val cents = embeddings.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val scoredLists = embeddings.select(col("vec_id"), col("embedding"))
      .join(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        cosine(col("embedding"), col("cv")).as("ccos"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
    val assigned = scoredLists
      .withColumn("crank", row_number().over(wAssign))
    val corpus = assigned.filter(col("crank") === 1)
      .select(col("vec_id").as("nid"), col("embedding").as("nv"), col("cid").as("list_id"))
    val probes = assigned.filter(col("crank") <= probeLists && col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("cid").as("list_id"))
    val scored = corpus.join(broadcast(probes), Seq("list_id"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos_sim"))
      .groupBy("qid", "nid").agg(max(col("cos_sim")).as("cos_sim")) // probe may hit 2 lists
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos_sim")
      .orderBy("qid", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: label-blocked all-pairs
    * (blocks bound the quadratic term; at scale the LSH signature from
    * lshSignature is the blocking key instead), global top-50 most
    * similar with deterministic tie-break.
    */
  def embeddingNearDup(embeddings: DataFrame, topN: Int = 50): DataFrame = {
    val a = embeddings.select(col("label").as("blk"), col("vec_id").as("id_a"),
      col("embedding").as("va"))
    val b = embeddings.select(col("label").as("blk_b"), col("vec_id").as("id_b"),
      col("embedding").as("vb"))
    a.join(b, col("blk") === col("blk_b") && col("id_a") < col("id_b"))
      .select(col("blk").as("label"), col("id_a"), col("id_b"),
        cosine(col("va"), col("vb")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }

  /** Per-label corpus stats: count + exact-summed mean norm (norms cast
    * to DECIMAL before the group sum so results don't drift with task
    * order), min/max norm.
    */
  def embeddingStats(embeddings: DataFrame): DataFrame = {
    val n = vnorm(col("embedding"))
    embeddings.select(col("label"), n.as("norm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vectors"),
        (sum(col("norm").cast(DecimalType(18, 9))).cast("double") /
          count(lit(1))).as("avg_norm"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"))
      .orderBy("label")
  }
}
