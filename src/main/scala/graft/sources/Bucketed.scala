package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table join: lineitem and orders both bucketed by the join key
  * into the session warehouse, so the join is co-located — zero Exchange on
  * either side of the SortMergeJoin (asserted in PlanSpec). Pre-bucketing
  * fact tables on their join keys is THE technique for removing the
  * dominant shuffle from repeated large-fact joins at warehouse scale.
  */
object Bucketed {

  private val nBuckets = 8

  private def tableName(base: String, dir: String): String =
    base + "_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** The in-memory catalog dies with the session but its warehouse files
    * survive — clear a stale location before re-creating the table.
    */
  private def clearStaleLocation(spark: SparkSession, table: String): Unit = {
    val warehouse = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
    }
  }

  /** Write both sides bucketed by orderkey (once per sf dir), return them. */
  def bucketedTables(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val li = tableName("li_bkt", dir)
    val ord = tableName("ord_bkt", dir)
    if (!spark.catalog.tableExists(li)) {
      clearStaleLocation(spark, li)
      clearStaleLocation(spark, ord)
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").saveAsTable(li)
    }
    if (!spark.catalog.tableExists(ord)) {
      clearStaleLocation(spark, ord)
      spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").saveAsTable(ord)
    }
    (spark.table(li), spark.table(ord))
  }

  /** Shuffle-free join over the bucketed tables. */
  def bucketedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val (li, ord) = bucketedTables(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }
}
