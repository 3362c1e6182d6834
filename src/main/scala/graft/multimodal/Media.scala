package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in distributed batches.
  *
  * The container has no image/audio codecs, so [[Media.decodeStub]] is a
  * clearly-marked deterministic stand-in for the real decoder; everything
  * around it — the binary column, metadata struct, per-partition batch
  * shape, fixed-width feature schema, partition-preserving mapPartitions —
  * is the real 100 TB-shape pipeline: payloads never leave the executor,
  * features are fixed-width arrays, and the decode loop is batched per
  * partition exactly as a Pandas-UDF/Arrow batch would be.
  */
object Media {

  /** Raw media row: payload + metadata the source system would attach. */
  final case class MediaRow(doc_id: Long, format: String, media: Array[Byte])

  /** Extracted features: fixed-width, columnar-friendly. */
  final case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_bytes: Int,
      mean_byte: Double,
      byte_entropy: Double,
      histogram: Array[Double])

  /** DECODE STUB — replace with a real decoder (JPEG/PNG/audio frames) when
    * codecs are available. Deterministic: a 16-bin byte histogram plus
    * moments, so tests and oracles are stable. The signature (bytes in,
    * fixed-width doubles out) is the real contract.
    */
  def decodeStub(bytes: Array[Byte]): (Double, Double, Array[Double]) = {
    val hist = new Array[Double](16)
    var sum = 0.0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b >> 4) += 1.0
      sum += b
      i += 1
    }
    val n = math.max(1, bytes.length)
    var entropy = 0.0
    var j = 0
    while (j < 16) {
      val p = hist(j) / n
      if (p > 0) entropy -= p * math.log(p) / math.log(2)
      j += 1
    }
    (sum / n, entropy, hist)
  }

  /** Per-frame features after frame sampling: fixed frame count per row. */
  final case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      frame_bytes: Int,
      mean_byte: Double)

  /** FRAME-SAMPLE STUB — a real implementation seeks key frames in a video
    * container; this deterministically samples `nFrames` equal-width byte
    * windows. The shape (payload in, bounded frame list out, exploded to
    * one row per frame) is the real contract.
    */
  def frameSampleStub(bytes: Array[Byte], nFrames: Int): Seq[(Int, Array[Byte])] = {
    if (bytes.isEmpty) return Seq.empty
    val width = math.max(1, bytes.length / nFrames)
    (0 until math.min(nFrames, bytes.length)).map { i =>
      val from = i * width
      (i, bytes.slice(from, math.min(from + width, bytes.length)))
    }
  }

  /** RESIZE STUB — a real implementation rescales pixel data; this folds the
    * 16-bin histogram to `bins` (power-of-two <= 16), preserving mass.
    */
  def resizeStub(hist: Array[Double], bins: Int): Array[Double] = {
    require(bins > 0 && 16 % bins == 0, s"bins must divide 16, got $bins")
    val factor = 16 / bins
    Array.tabulate(bins)(b => (0 until factor).map(k => hist(b * factor + k)).sum)
  }

  /** Frame-sampled features: one row per (doc, frame), bounded fan-out. */
  def frameFeatures(spark: SparkSession, dir: String, nFrames: Int = 4): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source").as("format"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
    media.flatMap { r =>
      frameSampleStub(r.media, nFrames).map { case (idx, frame) =>
        val (mean, _, _) = decodeStub(frame)
        FrameFeatures(r.doc_id, idx, frame.length, math.rint(mean * 10000) / 10000)
      }
    }.toDF()
  }

  /** Build the media table from documents (payload = UTF-8 bytes standing in
    * for an opaque blob), then extract features per partition.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source").as("format"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      // one decoder init per partition (the expensive part for real codecs)
      rows.map { r =>
        val (mean, entropy, hist) = decodeStub(r.media)
        MediaFeatures(r.doc_id, r.format, r.media.length,
          math.rint(mean * 10000) / 10000, math.rint(entropy * 10000) / 10000, hist)
      }
    }.toDF()
  }
}
