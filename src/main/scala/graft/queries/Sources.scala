package graft.queries

import graft.sources.FileSources
import org.apache.spark.sql.functions._

/** Source/sink round-trip queries: the aggregate over CSV- or JSON-round
  * -tripped documents must hash-match the oracle computed directly from the
  * parquet table — any loss in the write/read path (quoting, schema
  * inference, encoding) breaks the gate.
  */
object Sources {

  // Sums are CAST to BIGINT: DuckDB's sum(BIGINT) widens to HUGEINT while
  // Spark stays at BIGINT, and the gate hashes dtypes along with values.
  private val oracle =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       CAST(sum(length(text)) AS BIGINT) AS total_len
      |FROM documents GROUP BY lang""".stripMargin

  val csvRoundtrip: QueryDef = QueryDef(oracle) { (spark, dir) =>
    FileSources.documentsViaCsv(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        sum(length(col("text"))).as("total_len"))
  }

  val jsonRoundtrip: QueryDef = QueryDef(oracle) { (spark, dir) =>
    FileSources.documentsViaJson(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        sum(length(col("text"))).as("total_len"))
  }

  val orcRoundtrip: QueryDef = QueryDef(oracle) { (spark, dir) =>
    FileSources.documentsViaOrc(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        sum(length(col("text"))).as("total_len"))
  }

  /** Partition-pruned scan: only the lang=en directory is read (the plan's
    * PartitionFilters prove it — see PlanSpec); oracle filters the flat
    * parquet the ordinary way.
    */
  val partitionedScan: QueryDef = QueryDef(
    """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE lang = 'en' GROUP BY source""".stripMargin) { (spark, dir) =>
    FileSources.partitionedDocuments(spark, dir)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
  }

  /** Co-located bucketed join (zero Exchange); oracle joins the flat
    * parquet tables.
    */
  val bucketedJoin: QueryDef = QueryDef(
    """SELECT o_orderstatus, count(*) AS n_lines,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus""".stripMargin) { (spark, dir) =>
    graft.sources.Bucketed.bucketedJoinAgg(spark, dir)
  }

  val defs: Map[String, QueryDef] = Map(
    "q_source_csv" -> csvRoundtrip,
    "q_source_json" -> jsonRoundtrip,
    "q_source_orc" -> orcRoundtrip,
    "q_partitioned_scan" -> partitionedScan,
    "q_bucketed_join" -> bucketedJoin)
}
