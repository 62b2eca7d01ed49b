package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque `binary`
  * columns + typed metadata, with the decode/feature-extract step
  * behind a deterministic stub (no image/audio codecs in this
  * environment — the Spark-side plumbing is the deliverable).
  *
  * At scale: binary payloads stay columnar in parquet; the decode
  * stage is a per-partition batch map (mapPartitions) so a real codec
  * drops in without changing the plan shape; metadata extraction is a
  * pure expression pipeline.
  */
object Multimodal {

  /** Expression-only metadata extraction over the payload: byte length,
    * stub format sniff, stub-decoded dimensions (deterministic functions
    * of the payload size — clearly fake, engine-portable).
    */
  def mediaMeta(documents: DataFrame): DataFrame = {
    val payload = col("text").cast(BinaryType)
    val nBytes = octet_length(col("text")).cast(LongType)
    documents.select(
        col("doc_id"),
        nBytes.as("n_bytes"),
        when(nBytes % 3 === 0, "png")
          .when(nBytes % 3 === 1, "jpeg")
          .otherwise("webp").as("format"),
        ((nBytes * 7) % 640 + 16).as("width"),
        ((nBytes * 13) % 480 + 16).as("height"),
        (((nBytes * 7) % 640 + 16).cast("double") /
          ((nBytes * 13) % 480 + 16)).as("aspect_ratio"))
      // resize stage (stub): scale to width 256 preserving aspect via
      // integer math (deterministic, engine-portable)
      .withColumn("resized_w", lit(256L))
      .withColumn("resized_h", expr("(height * 256) div width"))
      .orderBy("doc_id")
  }

  /** Frame sampling for video-shaped payloads (stub): a deterministic
    * frame count from the payload size, one row per sampled frame with
    * a content-addressed frame id. The plan shape — narrow explode, no
    * shuffle — is what a real frame extractor produces.
    */
  def frameSample(documents: DataFrame): DataFrame = {
    val nBytes = octet_length(col("text")).cast(LongType)
    documents
      .select(col("doc_id"), nBytes.as("n_bytes"),
        (nBytes % 5 + 1).as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * 1000).as("frame_ts_ms"),
        md5(concat(col("doc_id").cast(StringType), lit(":"),
          col("frame_idx").cast(StringType)).cast(BinaryType)).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Audio-style window segmentation (stub): a deterministic duration
    * from the payload size, sliced into fixed 10-second analysis
    * windows (last window truncated) — the feature-extraction grain an
    * audio pipeline feeds to an encoder. Same narrow-explode shape as
    * [[frameSample]]; a real demuxer replaces only the duration/sample
    * derivation.
    */
  def audioWindows(documents: DataFrame, windowMs: Long = 10000L): DataFrame = {
    val nBytes = octet_length(col("text")).cast(LongType)
    documents
      .select(col("doc_id"), nBytes.as("n_bytes"),
        (nBytes * 37 % 50000 + 1000).as("duration_ms"))
      .select(col("doc_id"), col("duration_ms"),
        ((col("duration_ms") + windowMs - 1) / windowMs).cast(LongType).as("n_windows"))
      .select(col("doc_id"), col("duration_ms"), col("n_windows"),
        explode(sequence(lit(0L), col("n_windows") - 1)).as("window_idx"))
      .select(col("doc_id"), col("duration_ms"), col("n_windows"), col("window_idx"),
        (col("window_idx") * windowMs).as("start_ms"),
        least((col("window_idx") + 1) * windowMs, col("duration_ms")).as("end_ms"),
        md5(concat(col("doc_id").cast(StringType), lit(":aw:"),
          col("window_idx").cast(StringType)).cast(BinaryType)).as("window_md5"))
      .orderBy("doc_id", "window_idx")
  }

  /** Decoded-frame schema produced by the (stubbed) codec stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("mean_intensity", DoubleType)))

  /** Batch decode stage: per-partition map over (doc_id, payload)
    * batches — the drop-in point for a real codec. The stub derives
    * deterministic dimensions and a mean-intensity from payload bytes
    * (a real implementation would decode the image here; the plan
    * shape — narrow map, no shuffle — is identical).
    */
  def decodeBatch(spark: SparkSession, documents: DataFrame): DataFrame = {
    val input = documents.select(col("doc_id"),
      col("text").cast(BinaryType).as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val n = payload.length
        // STUB decode — a real codec (e.g. image decode) plugs in here.
        val width = (n * 7) % 640 + 16
        val height = (n * 13) % 480 + 16
        var sum = 0L
        var i = 0
        while (i < n) { sum += (payload(i) & 0xff); i += 1 }
        Row(id, width, height, 3, sum.toDouble / n)
      }
    }(enc)
  }
}
