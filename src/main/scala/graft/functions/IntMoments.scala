package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Integer-exact second-moment accumulator as a typed `Aggregator` — the
  * third and last extension surface the engine exercises (beside the
  * codegen'd Catalyst expressions [[PolyHash]]/[[SimHash64]] and the
  * whole-operator plan rules in graft.plans): a user-defined AGGREGATE
  * with a mergeable buffer, registered through `functions.udaf`.
  *
  * The state is the monoid (n, Σx, Σx²); `merge` adds component-wise, so
  * Spark runs it as a partial-then-final ObjectHashAggregate — map-side
  * combine works exactly as for built-in sums, which is the property that
  * makes a custom aggregate scale (an Aggregator without a cheap `merge`
  * degrades every 100 TB rollup into a single-reducer fold). The finish
  * emits the raw sufficient statistics ONLY; consumers derive the
  * variance numerator n·Σx² − (Σx)² in whatever width they need —
  * deliberately not here, because that product wraps int64 at
  * n ≈ √(2⁶³)/max|x| rows per group (≈ 4·10⁵ for this data's
  * cents ≤ ~6·10⁴), while Σx² itself stays in range to
  * n ≈ 2⁶³/max(x)² ≈ 2.5·10⁹ rows per group.
  *
  * Honesty note (the functions-not-UDFs rule): `var_pop`/`stddev` exist
  * as codegen'd built-ins and are what production code should call for
  * float variance. This Aggregator earns its place twice over: the gate
  * needs the INTEGER numerator (engine float accumulation orders differ,
  * a hash would flap), and the registry needs the typed-Aggregator
  * surface pinned by a correctness row, not just compiled.
  *
  * Input is the already-integer cents column; the buffer tuple stays in
  * unboxed longs via the product encoder. Beyond the Σx² bound above the
  * same shape runs on DECIMAL(38) buffers.
  */
object IntMoments extends Aggregator[Long, (Long, Long, Long), (Long, Long, Long)] {
  override def zero: (Long, Long, Long) = (0L, 0L, 0L)

  override def reduce(b: (Long, Long, Long), x: Long): (Long, Long, Long) =
    (b._1 + 1L, b._2 + x, b._3 + x * x)

  override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3)

  override def finish(r: (Long, Long, Long)): (Long, Long, Long) = r

  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
}
