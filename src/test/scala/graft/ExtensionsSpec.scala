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
}
