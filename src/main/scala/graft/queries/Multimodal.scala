package graft.queries

import graft.multimodal.Media
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary payload metadata (SQL-verifiable) and
  * the stubbed decode/feature-extraction pipeline (rows-only — the decode
  * stub has no SQL equivalent by design).
  */
object Multimodal {

  /** Metadata over opaque binary payloads: byte sizes and first-byte
    * diversity per source — the catalog-scan side of a media pipeline
    * (never decodes, reads only lengths).
    */
  val mediaMeta: QueryDef = QueryDef(
    """SELECT source, count(*) AS n_docs,
      |       sum(octet_length(encode(text))) AS total_bytes,
      |       max(octet_length(encode(text))) AS max_bytes,
      |       count(DISTINCT ascii(substr(text, 1, 1))) AS distinct_first_bytes
      |FROM documents GROUP BY source""".stripMargin) { (spark, dir) =>
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), octet_length(encode(col("text"), "UTF-8")).as("nb"),
        ascii(substring(col("text"), 1, 1)).as("fb"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nb")).as("total_bytes"),
        max(col("nb")).as("max_bytes"), countDistinct(col("fb")).as("distinct_first_bytes"))
  }

  /** Decode + feature extraction through the partition-batched stub. */
  val mediaFeatures: QueryDef = QueryDef.rowsOnly { (spark, dir) =>
    Media.features(spark, dir)
  }

  val defs: Map[String, QueryDef] = Map(
    "q_media_meta" -> mediaMeta,
    "q_media_features" -> mediaFeatures)
}
