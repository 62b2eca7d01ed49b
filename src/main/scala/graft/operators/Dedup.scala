package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** 5-char shingle array of the normalized text. */
  private def shingles(n: Column, len: Int = 5): Column =
    transform(sequence(lit(1), length(n) - lit(len - 1)),
      i => n.substr(i, lit(len)))

  /** One MinHash value: min over shingles of md5(shingle ‖ ':' ‖ seed).
    * String-min over md5 hex is a valid uniform min-hash and is
    * engine-portable (no 64-bit hex parsing needed).
    */
  private def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat(s, lit(s":$seed")).cast("binary"))))

  /** Exact dedup on normalized-text hash; canonical = min doc_id in the
    * hash group (ref data_validator.py:299 keep-first semantics).
    */
  def exact(documents: DataFrame): DataFrame = {
    val fp = md5(norm.cast("binary"))
    val w = Window.partitionBy(col("fp_md5"))
    documents.select(col("doc_id"), fp.as("fp_md5"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .select("doc_id", "fp_md5", "canonical_id", "is_dup")
      .orderBy("doc_id")
  }

  /** MinHash signatures (k=12) folded into 4 LSH bands of 3. Per-row
    * expression-only; emits (doc_id, band_0..band_3).
    */
  def minhashBands(documents: DataFrame): DataFrame = {
    val sh = shingles(col("nt"))
    val withMh = documents.select(col("doc_id"), norm.as("nt"))
      .select(col("doc_id") +: (0 until 12).map(k =>
        minhash(sh, k).as(s"mh_$k")): _*)
    val withBands = withMh.select(
      col("doc_id") +: (0 until 4).map(b =>
        md5(concat_ws("|", col(s"mh_${3 * b}"), col(s"mh_${3 * b + 1}"),
          col(s"mh_${3 * b + 2}")).cast("binary")).as(s"band_$b")): _*)
    withBands.orderBy("doc_id")
  }

  /** LSH candidate pairs: docs sharing any band key. Shuffle keys on
    * (band_idx, band_key) — short, uniform. Self-join then distinct.
    */
  def minhashPairs(documents: DataFrame): DataFrame = {
    val bands = minhashBands(documents)
      .select(col("doc_id"), posexplode(array(
        col("band_0"), col("band_1"), col("band_2"), col("band_3"))))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
    val a = bands.select(col("band_idx"), col("band_key"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band_idx").as("bi"), col("band_key").as("bk"),
      col("doc_id").as("doc_b"))
    a.join(b, col("band_idx") === col("bi") && col("band_key") === col("bk") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Blocked n-gram Jaccard: block on (lang, length-bucket), compare
    * distinct 4-gram sets within each block, keep the global top-100
    * most-similar pairs (deterministic tie-break on ids).
    */
  def jaccardTop(documents: DataFrame): DataFrame = {
    val grams = array_distinct(transform(sequence(lit(1), length(col("nt")) - lit(3)),
      i => col("nt").substr(i, lit(4))))
    val g = documents.select(
      col("doc_id"),
      concat(col("lang"), lit(":"), (col("n_chars") / lit(100)).cast(LongType)).as("blk"),
      norm.as("nt"))
      .select(col("doc_id"), col("blk"), grams.as("gs"))
    val a = g.select(col("blk"), col("doc_id").as("doc_a"), col("gs").as("gs_a"))
    val b = g.select(col("blk").as("blk_b"), col("doc_id").as("doc_b"), col("gs").as("gs_b"))
    a.join(b, col("blk") === col("blk_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("gs_a"), col("gs_b"))).cast(LongType).as("n_common"),
        (size(col("gs_a")) + size(col("gs_b")) -
          size(array_intersect(col("gs_a"), col("gs_b")))).cast(LongType).as("n_union"))
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(100)
  }

  /** 32-bit SimHash: bit j is the sign of Σ_tokens (±1 by whether hex
    * nibble j of md5(token) has its top bit set). Near-dup docs differ
    * in few bits. Emitted as a 32-char bitstring (portable, groupable).
    */
  def simhash(documents: DataFrame): DataFrame = {
    // md5 once per token, then 32 nibble-majority folds over the digests
    val bits = transform(sequence(lit(1), lit(32)), j =>
      when(aggregate(col("tms"), lit(0),
        (acc, m) => acc + when(m.substr(j, lit(1)) >= "8", 1).otherwise(-1))
        > 0, "1").otherwise("0"))
    documents.select(col("doc_id"), norm.as("nt"))
      .select(col("doc_id"),
        transform(split(col("nt"), " "), t => md5(t.cast("binary"))).as("tms"))
      .select(col("doc_id"), concat_ws("", bits).as("simhash"))
      .orderBy("doc_id")
  }
}
