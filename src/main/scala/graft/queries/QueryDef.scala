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

/** The in-row ordered-pair expansion shared by every bucket/basket family
  * (MinHash bands, SimHash bands, n-gram postings, LSH cells, co-purchase
  * and co-occurrence baskets): each row's sorted array column fans out to
  * its element pairs (i < j) WITHOUT a self-join — the expansion is
  * bounded by the bucket/basket size, never quadratic in the table.
  * Centralized (code-review r12: six hand-maintained copies) so the one
  * footgun lives in one place: `sequence(0, -1)` DESCENDS rather than
  * returning empty, so the size ≥ 2 guard here is load-bearing — an
  * unguarded transform indexes out of range on singleton rows.
  */
private[queries] object Pairs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** The raw ordered-pair (i < j) expansion over a sorted array column,
    * with the pair combiner pluggable — callers must still guard
    * `size(arr) >= 2` before exploding (`sequence(0, -1)` DESCENDS).
    * [[ordered]] combines into a two-field struct. ONE deliberate
    * non-caller: Graph's triangle wedges (r16) expand in two CHUNKED
    * levels (posexplode center + per-center tail) precisely to avoid the
    * single C(n,2)-long transient this one-shot expansion materializes —
    * its inner `sequence(i + 1, size - 1)` carries its own guard
    * (`i < size - 1` filtered two lines above; see Graph.scala). Audit
    * both sites when touching the sequence() semantics.
    */
  def orderedExpr(arr: Column, combine: (Column, Column) => Column): Column =
    flatten(transform(sequence(lit(0), size(arr) - 2), i =>
      transform(sequence(i + 1, size(arr) - 1), j =>
        combine(element_at(arr, i + 1), element_at(arr, j + 1)))))

  /** Rows of (aName, bName) pairs, one per ordered element pair of `arr`;
    * other columns are dropped (every call site keeps only the pair).
    */
  def ordered(df: DataFrame, arr: String, aName: String, bName: String): DataFrame = {
    val a = org.apache.spark.sql.functions.col(arr)
    val pairsExpr = orderedExpr(a, (x, y) => struct(x.as(aName), y.as(bName)))
    df.filter(size(a) >= 2)
      .select(explode(pairsExpr).as("p"))
      .select(col(s"p.$aName").as(aName), col(s"p.$bName").as(bName))
  }
}
