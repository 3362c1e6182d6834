package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions descriptor plumbing: the exact (identifier, info,
  * builder) triples the installer injects are registered into a session's
  * function registry — the same call `injectFunction` performs at session
  * build — and then exercised through PURE SQL, no Scala Column API.
  * (The builder-side `withExtensions` wiring itself is Spark's code and
  * cannot be re-tested here: `getOrCreate()` returns the suite-shared
  * session, ignoring new extensions by design.)
  */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-extensions-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("injected function descriptors evaluate through pure SQL") {
    spark.sparkContext.setLogLevel("WARN")
    val reg = spark.sessionState.functionRegistry
    Seq(GraftExtensions.polyHashDesc, GraftExtensions.dotProductDesc,
      GraftExtensions.simHashDesc).foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
    val r = spark.sql(
      """SELECT poly_hash('abc') AS h,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       simhash64(array('a', 'b')) AS s""".stripMargin).collect()(0)
    assert(r.getLong(0) == graft.functions.PolyHash.hash(UTF8String.fromString("abc")))
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[Long](2).length == 2)
  }

  test("IntMoments merge law: every split of the input folds to the same state") {
    import graft.functions.IntMoments
    // The q_typed_agg gate only exercises whatever split Spark's partial
    // aggregation happens to pick; this pins the monoid law for ALL splits
    // (the associativity a broken UDAF merge violates first).
    val xs = Seq(3L, 7L, 0L, -2L, 11L, 5L)
    val whole = xs.foldLeft(IntMoments.zero)(IntMoments.reduce)
    for (i <- 0 to xs.size) {
      val (l, rr) = xs.splitAt(i)
      val merged = IntMoments.merge(
        l.foldLeft(IntMoments.zero)(IntMoments.reduce),
        rr.foldLeft(IntMoments.zero)(IntMoments.reduce))
      assert(merged == whole, s"split at $i diverged")
    }
    assert(IntMoments.finish(whole) == ((6L, 24L, 208L)))
  }
}
