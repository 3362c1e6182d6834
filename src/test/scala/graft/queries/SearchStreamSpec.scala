package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Restart-recovery pin for q_search_stream (VERDICT r12 #6): the streaming
  * search program's only state is the committed offset cursor, and the
  * stencil generator replays any range bit-for-bit — so a run stopped after
  * N points and RESTARTED against the same checkpoint with a larger
  * maxPoints must resume at N+1, never re-emit, never skip, and agree with
  * the golden stencil prefix on every evaluation.
  */
class SearchStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-search-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def readEvals(out: String): Map[Int, (Double, Double, Double)] =
    spark.read.parquet(s"$out/data")
      .select("idx", "x", "y", "cost")
      .collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap

  test("stop after 200 points, restart to 500: exactly-once, golden-prefix-exact") {
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files.createTempDirectory("graft-search-stream").toString

    ReferenceOps.runSearchStream(spark, out, 200)
    val first = readEvals(out)
    assert(first.keySet == (1 to 200).toSet,
      s"first run must emit idx 1..200 exactly once, got ${first.size} keys")

    ReferenceOps.runSearchStream(spark, out, 500)
    val all = readEvals(out)
    // the parquet map would have collapsed a re-emitted duplicate silently;
    // a RAW row count catches it
    val rawCount = spark.read.parquet(s"$out/data").count()
    assert(rawCount == 500L, s"sink must hold exactly 500 rows, got $rawCount")
    assert(all.keySet == (1 to 500).toSet, "restart must resume at 201, not replay or skip")
    first.foreach { case (i, v) =>
      assert(all(i) == v, s"restart mutated already-committed idx $i")
    }

    // every evaluation equals the golden stencil prefix shifted to the
    // (10, 15) start, with the sphere cost — exact IEEE equality
    val prefix = graft.SparkEntry.queries("q_stencil_prefix")(spark, "")
      .collect()
      .map(r => r.getInt(r.fieldIndex("idx")) ->
        ((10.0 + r.getDouble(r.fieldIndex("x")), 15.0 + r.getDouble(r.fieldIndex("y")))))
      .toMap
    all.foreach { case (i, (x, y, cost)) =>
      assert(prefix(i) == ((x, y)), s"idx $i point drifted from the golden prefix")
      assert(cost == Array(x, y).map(v => v * v).sum, s"idx $i cost is not the sphere objective")
    }
  }
}
