package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode/feature-extract
  * operators.
  *
  * The actual media decoding is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake features from
  * the bytes. Everything around it — schema, typed rows, partition-local
  * batching, feature array shape, frame sampling — is the real plumbing a
  * production decode would drop into: swap `decodeStub`'s body for a
  * JNI/library call and nothing else changes.
  *
  * Scale notes: decoding is per-row CPU work with no shuffle; batching
  * inside `mapPartitions` amortizes per-batch setup (the Scala analogue
  * of Arrow-batched pandas UDFs) and keeps memory bounded by
  * batchSize × max asset size, independent of partition row count.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata. */
  case class MediaRow(doc_id: Long, modality: String, content: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Int,
                           features: Array[Float])

  val FeatureDim = 8

  /** STUB decode: a real implementation would decode image/audio bytes
    * here (e.g. via a native library) and emit pooled features. The fake
    * is deterministic in the bytes so tests and reruns agree.
    *
    * Lane sums accumulate in integers and divide by 255 exactly once at
    * the end: `round(feature * 255)` then recovers the integer lane sum
    * bit-exactly (float32 relative error ~6e-8 ≪ 0.5/laneSum for any
    * asset below ~8 MB/lane), which is what the driver-facing oracle
    * projection in SparkEntry relies on. */
  private def decodeStub(row: MediaRow): MediaFeatures = {
    val sums = new Array[Long](FeatureDim)
    var i = 0
    while (i < row.content.length) {
      sums(i % FeatureDim) += (row.content(i) & 0xff)
      i += 1
    }
    val feats = new Array[Float](FeatureDim)
    var j = 0
    while (j < FeatureDim) { feats(j) = sums(j) / 255.0f; j += 1 }
    MediaFeatures(row.doc_id, row.modality, row.content.length, feats)
  }

  /** Fabricate a media table from documents: UTF-8 bytes stand in for
    * encoded assets; modality assigned round-robin; metadata typed. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      lit(64).as("width"), lit(64).as("height"),
      lit(16000).as("sample_rate"))

  /** Batch-shaped feature extraction: partition-local, grouped into
    * fixed-size batches (the decode library's preferred call shape). */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map(decodeStub)))
      .toDF()
  }

  /** STUB resize: a real implementation decodes, resamples and re-encodes
    * the image. The fake emits a deterministic targetW×targetH byte plane
    * derived from the source bytes, so the size/schema contract downstream
    * operators rely on is real. */
  private def resizeStub(row: MediaRow, tw: Int, th: Int): MediaRow = {
    val out = new Array[Byte](tw * th)
    if (row.content.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = row.content(i % row.content.length)
        i += 1
      }
    }
    row.copy(content = out, width = tw, height = th)
  }

  /** Resize image rows to targetW×targetH (other modalities pass through
    * untouched). Same batch-shaped, shuffle-free execution as
    * extractFeatures. */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int,
                   batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        if (r.modality == "image") resizeStub(r, targetW, targetH) else r
      }))
      .toDF()
  }

  /** Frame sampling for video rows: every strideMs milliseconds up to
    * durationMs, exploded to one row per sampled frame offset. */
  def sampleFrames(media: DataFrame, durationMs: Int, strideMs: Int): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(durationMs - 1), lit(strideMs)))
          .as("frame_ms"))
}
