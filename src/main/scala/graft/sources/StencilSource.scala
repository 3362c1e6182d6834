package graft.sources

import java.util

import graft.stencil.RightHandedSimplexStencil
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The reference's infinite stencil stream as a DataSource V2 TABLE —
  * the (c)-tier extension surface on the SOURCE side (the function
  * injector covers expressions; this covers `spark.read.format(...)`):
  *
  * {{{
  *   spark.read.format("graft.sources.StencilSource")
  *     .option("dims", 2).option("maxHalvings", 7)
  *     .load()                    // UNBOUNDED table
  *     .limit(500)                // REQUIRED: pushed into the scan
  * }}}
  *
  * The stream is infinite by design (`RightHandedSimplexStencil`
  * generates forever; reference `stencil.py` generate_stencil_points),
  * so the connector REFUSES to plan a full-table scan: the ScanBuilder
  * implements `SupportsPushDownLimit`, and `build()` without a pushed
  * limit throws with instructions rather than letting an innocent
  * `count()` spin forever. This is the honest V2 contract for unbounded
  * relations — the same reason Kafka's batch source demands offsets.
  *
  * One input partition, deliberately: stencil generation is a
  * sequential driver-side recurrence (each simplex derives from its
  * parent), so "parallelizing" the generator would just move the
  * sequential walk behind a shuffle. Parallelism belongs to the
  * CONSUMERS — the evaluation waves — exactly as in the search loop.
  * The rows are planner-scale (a prefix of a few thousand trial
  * points), so a single partition is the right shape, not a limitation.
  */
class StencilSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StencilSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StencilSource.StencilTable
}

object StencilSource {

  val Schema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("halvings", IntegerType, nullable = false),
    StructField("offset", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Option parsing lives in [[Table.newScanBuilder]], NOT in
    * `TableProvider.getTable`: the batch read path forwards reader options
    * to both, but the STREAMING path resolves the table without them and
    * only the per-scan `CaseInsensitiveStringMap` carries what the user
    * passed (empirically: a `maxPoints` parsed at getTable time silently
    * defaulted to unbounded under `readStream`, and the gate stream never
    * terminated — the same reason Kafka parses its options in the scan
    * builder).
    */
  private[sources] final class StencilTable extends Table with SupportsRead {
    override def name(): String = "stencil"
    override def schema(): StructType = Schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
      val dims = options.getInt("dims", 2)
      val mh = options.getInt("maxHalvings", 7)
      val perBatch = options.getLong("pointsPerBatch", 100L)
      val maxPoints = options.getLong("maxPoints", Long.MaxValue)
      require(dims >= 1, s"dims must be >= 1 (got $dims)")
      require(perBatch >= 1, s"pointsPerBatch must be >= 1 (got $perBatch)")
      new StencilScanBuilder(dims, mh, perBatch, maxPoints)
    }
  }

  private final class StencilScanBuilder(
      dims: Int, maxHalvings: Int, perBatch: Long, maxPoints: Long)
      extends ScanBuilder with SupportsPushDownLimit {
    private var limit: Int = -1
    override def pushLimit(l: Int): Boolean = { limit = l; true } // fully pushed
    override def build(): Scan =
      new StencilScan(dims, maxHalvings, limit, perBatch, maxPoints)
  }

  private final class StencilScan(
      dims: Int, maxHalvings: Int, limit: Int, perBatch: Long, maxPoints: Long)
      extends Scan with Batch {
    override def readSchema(): StructType = Schema
    // The batch path keeps the mandatory-limit contract: an unbounded scan
    // refuses at physical planning (same observable behavior as the old
    // build()-time refusal — count() fails loudly before generating).
    // The STREAMING path legitimately has no limit: unboundedness is the
    // normal condition of a stream, and termination belongs to the trigger
    // (or the optional maxPoints cap), exactly as with Spark's rate source.
    override def toBatch: Batch = {
      require(limit >= 0,
        "the stencil table is UNBOUNDED (the reference's lazy BFS generates " +
          "forever); add .limit(n) / LIMIT n directly over the relation so " +
          "the scan can push it down")
      this
    }
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new StencilMicroBatch(dims, maxHalvings, perBatch, maxPoints)
    override def description(): String =
      s"graft stencil prefix: dims=$dims maxHalvings=$maxHalvings limit=$limit"
    override def planInputPartitions(): Array[InputPartition] =
      Array(StencilPartition(dims, maxHalvings, 0L, limit.toLong))
    override def createReaderFactory(): PartitionReaderFactory =
      StencilReaderFactory
  }

  /** The infinite generator as a STRUCTURED STREAMING source — the shape
    * the reference actually runs (its search loop consumes the stencil as
    * an endless stream): offsets are "points emitted so far", each trigger
    * advances by `pointsPerBatch` (capped by the optional `maxPoints`,
    * after which the stream reports no new data — the bounded-replay mode
    * the gate row uses), and recovery is exact because the generator is
    * deterministic: replaying offset range [a, b) always yields the same
    * points, which is the entire exactly-once story — no sink-side dedup
    * needed.
    */
  private final class StencilMicroBatch(
      dims: Int, maxHalvings: Int, perBatch: Long, maxPoints: Long)
      extends MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
    import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

    override def initialOffset(): Offset = StencilOffset(0L)

    /** STATELESS batch sizing via admission control: the next end offset is
      * a pure function of the START offset Spark hands us — never of
      * instance state. The first cut kept a mutable cursor advanced by
      * `latestOffset()`; on restart Spark calls that BEFORE restoring the
      * checkpointed position, so the fresh instance re-issued early
      * offsets and a recovered query re-emitted committed ranges
      * (observed: batch start=300, end=100, then a 300-row replay batch).
      * `latestOffset(start, limit)` cannot regress by construction.
      */
    override def latestOffset(start: Offset, limit: ReadLimit): Offset =
      StencilOffset(math.min(start.asInstanceOf[StencilOffset].n + perBatch, maxPoints))
    override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(perBatch)
    override def latestOffset(): Offset =
      throw new UnsupportedOperationException(
        "admission-control source: Spark must call latestOffset(start, limit)")

    override def deserializeOffset(json: String): Offset =
      StencilOffset(json.trim.toLong)
    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
      Array(StencilPartition(dims, maxHalvings,
        start.asInstanceOf[StencilOffset].n, end.asInstanceOf[StencilOffset].n))
    override def createReaderFactory(): PartitionReaderFactory = StencilReaderFactory
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }

  private final case class StencilOffset(n: Long)
      extends org.apache.spark.sql.connector.read.streaming.Offset {
    override def json(): String = n.toString
  }

  /** One partition = the point range [start, end) of the deterministic
    * sequence; `end` carries the batch limit for both the batch scan
    * (start 0) and micro-batch ranges.
    */
  private final case class StencilPartition(
      dims: Int, maxHalvings: Int, start: Long, end: Long)
      extends InputPartition

  /** Per-JVM prefix cache keyed by (dims, maxHalvings) — the reference's
    * prefix-replay rule (stencil.py:97-98, 202-203) applied across
    * micro-batches: batch k must re-emit points [k·B, (k+1)·B) and a
    * cache-less replay would regenerate the whole prefix per batch
    * (quadratic over the stream's life). Each executor warms its own
    * cache once and every later batch extends it incrementally. The
    * synchronized slice is required because the underlying stencil
    * supports one active iterator at a time; ranges are perBatch-bounded
    * so the critical section is short.
    */
  private object StencilCache {
    private val cache =
      scala.collection.concurrent.TrieMap.empty[(Int, Int), RightHandedSimplexStencil]
    def slice(dims: Int, mh: Int, start: Long, end: Long): Array[graft.stencil.StencilStep] = {
      val st = cache.getOrElseUpdate((dims, mh), new RightHandedSimplexStencil(dims, mh))
      st.synchronized {
        st.stencilPoints.slice(start.toInt, end.toInt).toArray
      }
    }
  }

  private object StencilReaderFactory extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[StencilPartition]
      new PartitionReader[InternalRow] {
        private val steps = StencilCache.slice(p.dims, p.maxHalvings, p.start, p.end)
        private var i = 0
        private var row: InternalRow = _
        override def next(): Boolean =
          if (i >= steps.length) false
          else {
            val s = steps(i)
            i += 1
            row = new GenericInternalRow(Array[Any](
              (p.start + i).toInt, s.halvings, ArrayData.toArrayData(s.offset)))
            true
          }
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    }
  }
}
