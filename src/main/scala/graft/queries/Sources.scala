package graft.queries

import graft.sources.FileSources
import org.apache.spark.sql.functions._

/** Source/sink round-trip queries: the aggregate over CSV- or JSON-round
  * -tripped documents must hash-match the oracle computed directly from the
  * parquet table — any loss in the write/read path (quoting, schema
  * inference, encoding) breaks the gate.
  */
object Sources {

  private val oracle =
    """SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars,
      |       sum(length(text)) AS total_len
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

  val defs: Map[String, QueryDef] = Map(
    "q_source_csv" -> csvRoundtrip,
    "q_source_json" -> jsonRoundtrip)
}
