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
