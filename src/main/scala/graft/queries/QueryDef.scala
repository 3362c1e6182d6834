package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a DataFrame program plus (when SQL-expressible) an
  * equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. Column names/types must line up exactly — the driver
  * sorts columns by name and hashes values (see the builder contract).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
