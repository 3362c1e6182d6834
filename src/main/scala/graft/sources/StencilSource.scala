package graft.sources

import java.util

import graft.stencil.RightHandedSimplexStencil
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
      properties: util.Map[String, String]): Table = {
    val dims = Option(properties.get("dims")).map(_.toInt).getOrElse(2)
    val mh = Option(properties.get("maxhalvings")).map(_.toInt).getOrElse(7)
    require(dims >= 1, s"dims must be >= 1 (got $dims)")
    new StencilSource.StencilTable(dims, mh)
  }
}

object StencilSource {

  val Schema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("halvings", IntegerType, nullable = false),
    StructField("offset", ArrayType(DoubleType, containsNull = false), nullable = false)))

  private[sources] final class StencilTable(dims: Int, maxHalvings: Int)
      extends Table with SupportsRead {
    override def name(): String = s"stencil(dims=$dims, maxHalvings=$maxHalvings)"
    override def schema(): StructType = Schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new StencilScanBuilder(dims, maxHalvings)
  }

  private final class StencilScanBuilder(dims: Int, maxHalvings: Int)
      extends ScanBuilder with SupportsPushDownLimit {
    private var limit: Int = -1
    override def pushLimit(l: Int): Boolean = { limit = l; true } // fully pushed
    override def build(): Scan = {
      require(limit >= 0,
        "the stencil table is UNBOUNDED (the reference's lazy BFS generates " +
          "forever); add .limit(n) / LIMIT n directly over the relation so " +
          "the scan can push it down")
      new StencilScan(dims, maxHalvings, limit)
    }
  }

  private final class StencilScan(dims: Int, maxHalvings: Int, limit: Int)
      extends Scan with Batch {
    override def readSchema(): StructType = Schema
    override def toBatch: Batch = this
    override def description(): String =
      s"graft stencil prefix: dims=$dims maxHalvings=$maxHalvings limit=$limit"
    override def planInputPartitions(): Array[InputPartition] =
      Array(StencilPartition(dims, maxHalvings, limit))
    override def createReaderFactory(): PartitionReaderFactory =
      StencilReaderFactory
  }

  private final case class StencilPartition(dims: Int, maxHalvings: Int, limit: Int)
      extends InputPartition

  private object StencilReaderFactory extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[StencilPartition]
      new PartitionReader[InternalRow] {
        private val it =
          new RightHandedSimplexStencil(p.dims, p.maxHalvings)
            .stencilPoints.take(p.limit).iterator
        private var i = 0
        private var row: InternalRow = _
        override def next(): Boolean =
          if (!it.hasNext) false
          else {
            val s = it.next()
            i += 1
            row = new GenericInternalRow(Array[Any](
              i, s.halvings, ArrayData.toArrayData(s.offset)))
            true
          }
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    }
  }
}
