package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Streaming-row band + scaling measurement (VERDICT r10 next-round #1/#4).
  *
  * Times the given registry queries N times each (after one warm-up) at one
  * or more sf dirs, in a single JVM configured exactly like graft.Bench's
  * child, and prints one JSON line per (query, sfDir) with ALL observed
  * times — not just the median — so run-to-run spread is a measured band,
  * not an anecdote. Two uses:
  *
  *   1. Variance band for pin discipline: `q_session_window_stream`'s gate
  *      excursion (4.2 s vs pin 1.85) is adjudicated by a 5-run band at
  *      sf0.1; the pin and its documented band in SCALE.md come from this
  *      tool's output, committed with the invocation line.
  *   2. Flat-vs-linear split: running a representative stateful row (e.g.
  *      `q_stream_join`) at sf0.001/0.01/0.1 shows wall time barely moves
  *      while data grows 100x — the micro-batch machinery (state store
  *      init, checkpoint IO, per-batch planning) is FIXED overhead that
  *      amortizes at scale, which SCALE.md claims and this measures.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StreamBand \
  *     q_session_window_stream,q_stream_join 5 \
  *     /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1"
  */
object StreamBand {
  def main(args: Array[String]): Unit = {
    val queries = args.headOption
      .map(_.split(',').toSeq)
      .getOrElse(Seq("q_session_window_stream"))
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val dirs =
      if (args.length > 2) args.drop(2).toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Session + cache drop shared with Bench (code-review r16): band
    // numbers must come from the same engine configuration as the bench
    // pins they adjudicate.
    val spark = graft.Bench.benchSession(cpus)
    for (dir <- dirs; q <- queries) {
      val fn = SparkEntry.queries(q)
      fn(spark, dir).count() // warm-up, untimed
      drop(spark)
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        drop(spark)
        math.rint(dt * 1000) / 1000
      }
      val sorted = times.sorted
      val med = if (n % 2 == 1) sorted(n / 2)
                else (sorted(n / 2 - 1) + sorted(n / 2)) / 2
      println(
        s"""{"query":"$q","sf":"$dir","n":$n,"times":[${times.mkString(",")}],""" +
        s""""min":${sorted.head},"median":$med,"max":${sorted.last}}""")
    }
    spark.stop()
  }

  private def drop(spark: SparkSession): Unit = graft.Bench.dropAllCaches(spark)
}
