package graft.streaming

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming sessionization vs its batch twin: every session the
  * streaming job closed (watermark passed) must appear identically in the
  * window-function batch result.
  */
class StreamingSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("flatMapGroupsWithState sessions match the batch window sessions") {
    spark.sparkContext.setLogLevel("WARN")
    val q = Sessionize.sessions(spark, sf).writeStream
      .outputMode("append")
      .format("memory")
      .queryName("graft_sessions_stream")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // Same Spark round() on the streamed fixed-point sum as the batch
    // query applies, so the doubles compare exactly.
    import org.apache.spark.sql.functions.{col, round}
    val streamed = spark.table("graft_sessions_stream")
      .select(col("user_id"), col("start_us"), col("end_us"), col("n"),
        round(col("sum_fixed") / 10000.0, 2).as("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet

    val batch = SparkEntry.queries("q_sessionize")(spark, sf)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")),
        r.getLong(r.fieldIndex("start_us")),
        r.getLong(r.fieldIndex("end_us")),
        r.getLong(r.fieldIndex("n")),
        r.getDouble(r.fieldIndex("sum_value"))))
      .toSet

    assert(streamed.nonEmpty, "streaming closed no sessions — watermark never advanced")
    val missing = streamed -- batch
    assert(missing.isEmpty,
      s"${missing.size} streamed sessions absent from batch result; e.g. ${missing.take(3)}")
    // The open tail (at most one session per user) may be unclosed at stream
    // end; everything the watermark passed must have been emitted.
    assert(streamed.size >= batch.size / 2,
      s"suspiciously few closed sessions: ${streamed.size} of ${batch.size}")
  }

  test("stream-stream interval join equals the batch interval join") {
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, expr}
    // an INNER interval join on bounded input must emit exactly the batch
    // join's pairs, independent of micro-batch arrival order
    val streamed = graft.queries.Events.streamJoin.fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val batch = c.join(p, "user_id")
      .filter(col("pts") >= col("cts") && col("pts") <= col("cts") + 3600000000000L)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        expr("(pts - cts) div 1000000000").as("lag_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stream-batch mismatch: only-stream=${(streamed -- batch).take(3)}, " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }
}
