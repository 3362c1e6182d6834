package graft.spark

import graft.search.{SearchResult, TrialPoint}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Row form of a [[TrialPoint]] — the durable provenance analog of the
  * reference's results dict (search.py:175, SURVEY §1.1 Spark mapping).
  * `key`/`parentKey` are exact string encodings of the snapped coordinates
  * (IEEE-754 bits), so joins and groupBys on identity are exact, never
  * float-fuzzy.
  */
final case class EvaluationRow(
    key: String,
    point: Array[Double],
    halvings: Int,
    parentKey: String,
    isAccepted: Boolean,
    isBest: Boolean,
    startTime: Double,
    stopTime: Double,
    cost: Double)

object Provenance {

  def keyOf(p: TrialPoint): String =
    p.point.map(v => java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(v)))
      .mkString("_")

  def toRows(res: SearchResult): Seq[EvaluationRow] = {
    val bestKey = keyOf(res.best)
    res.evaluations.map { p =>
      EvaluationRow(keyOf(p), p.point, p.halvings, keyOf(p.parent), p.isAccepted,
        keyOf(p) == bestKey, p.startTime, p.stopTime, p.cost)
    }
  }

  /** The evaluations table: one row per evaluated trial point with lineage.
    * This is the queryable surface over a finished search (top-k, lineage
    * self-joins, accepted-center chains — SURVEY §2.5).
    */
  def toDF(spark: SparkSession, res: SearchResult): DataFrame = {
    import spark.implicits._
    spark.createDataset(toRows(res)).toDF()
  }
}
