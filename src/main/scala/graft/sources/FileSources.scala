package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-format source/sink round-trips: the engine reads parquet natively;
  * CSV and JSON are exercised as full write-then-read round-trips so the
  * driver gate verifies the format paths end-to-end (the round-tripped
  * aggregate must hash-match the oracle computed straight from parquet).
  */
object FileSources {

  private def roundtripDir(fmt: String, dir: String): String = {
    val sf = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/tmp/graft_roundtrip_$fmt$sf"
  }

  /** documents -> CSV -> read back. Text is single-line ASCII; quoting is
    * still enabled so embedded delimiters would survive.
    */
  def documentsViaCsv(spark: SparkSession, dir: String): DataFrame = {
    val out = roundtripDir("csv", dir)
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))
      .write.mode(SaveMode.Overwrite)
      .option("header", "true").option("quoteAll", "true")
      .csv(out)
    spark.read
      .option("header", "true")
      .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG, text STRING")
      .csv(out)
  }

  /** documents -> JSON lines -> read back with explicit schema. */
  def documentsViaJson(spark: SparkSession, dir: String): DataFrame = {
    val out = roundtripDir("json", dir)
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode(SaveMode.Overwrite).json(out)
    spark.read
      .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG, text STRING")
      .json(out)
  }

  /** documents -> ORC -> read back (columnar sibling format). */
  def documentsViaOrc(spark: SparkSession, dir: String): DataFrame = {
    val out = roundtripDir("orc", dir)
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode(SaveMode.Overwrite).orc(out)
    spark.read.orc(out)
  }

  /** documents re-laid-out as a lang-partitioned parquet dataset: the
    * directory layout (lang=en/...) is what lets Catalyst prune entire
    * partitions from a scan (`PartitionFilters` in the plan) — the primary
    * IO lever at 100 TB. Written once per (format, sf) and reused.
    */
  def partitionedDocuments(spark: SparkSession, dir: String): DataFrame = {
    val out = roundtripDir("part", dir)
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      spark.read.parquet(s"$dir/documents.parquet")
        .write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(out)
    }
    spark.read.parquet(out)
  }
}
