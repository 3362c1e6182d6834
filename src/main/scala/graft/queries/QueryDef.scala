package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a DataFrame program plus (when SQL-expressible) an
  * equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. Column names/types must line up exactly — the driver
  * sorts columns by name and hashes values (see the builder contract).
  *
  * The oracle is evaluated LAZILY: several oracles are VALUES literals
  * computed from deterministic in-process runs (stencil prefix, seeded
  * search), and a strict field would force that work at registry
  * construction — every Bench child JVM would pay for a full driver-side
  * search just to look up an unrelated query's function.
  */
final class QueryDef(
    val fn: (SparkSession, String) => DataFrame,
    oracleThunk: Option[() => String]) {
  lazy val oracle: Option[String] = oracleThunk.map(_())
}

object QueryDef {
  def apply(oracle: => String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    new QueryDef(fn, Some(() => oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    new QueryDef(fn, None)
}
