package graft.spark

import graft.search.{EvalClient, Objective}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.{Executors, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.collection.mutable
import scala.util.{Failure, Success, Try}

/** Spark-backed evaluation client: each submitted wave (one trial point, or
  * `batchsize` points — reference search.py:185-201) becomes one
  * asynchronous Spark job; completed waves land on a completion queue the
  * driver loop drains.
  *
  * This preserves the reference's occupancy model (dask futures continuously
  * fed to a scheduler, clients.py:9-24) on Spark's job/wave execution model:
  * up to `maxQueueSize` jobs are in flight concurrently, each evaluating its
  * points with `mapPartitions` (the vectorized form is the per-partition
  * batch call — `Objective.applyBatch`).
  *
  * `evalPartitions` controls fan-out within a wave; waves are small (1..
  * batchsize points) so the default of one partition per wave amortizes task
  * overhead while concurrency across waves fills the cluster. On a real
  * cluster the same discipline holds: occupancy comes from concurrent jobs,
  * not from splitting a tiny wave.
  */
final class SparkClient(
    spark: SparkSession,
    evalPartitions: Int = 1) extends EvalClient {

  private val ids = new AtomicLong(0L)
  private val pendingCount = new AtomicInteger(0)
  private val completed = new LinkedBlockingQueue[(Long, Try[Array[Double]])]()
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "graft-spark-eval")
    t.setDaemon(true)
    t
  }

  override def submit(objective: Objective, points: IndexedSeq[Array[Double]]): Long = {
    val id = ids.incrementAndGet()
    pendingCount.incrementAndGet()
    val sc = spark.sparkContext
    val nParts = math.max(1, math.min(evalPartitions, points.length))
    pool.execute { () =>
      val res = Try {
        sc.parallelize(points, nParts)
          .mapPartitions { it =>
            val xs = it.toIndexedSeq
            objective.applyBatch(xs).iterator
          }
          .collect()
      }
      completed.put((id, res))
    }
    id
  }

  override def hasResults: Boolean = !completed.isEmpty

  override def nextBatch(block: Boolean): Seq[(Long, Array[Double])] = {
    val out = mutable.ArrayBuffer.empty[(Long, Try[Array[Double]])]
    var first = completed.poll()
    if (first == null && block && pendingCount.get() > 0) {
      // Block for the next completion; bounded poll so a dead job cannot
      // wedge the driver loop forever.
      while (first == null && pendingCount.get() > 0)
        first = completed.poll(100, TimeUnit.MILLISECONDS)
    } else if (first == null && !block) {
      // Tiny pause so the driver loop does not hot-spin while waiting
      Thread.sleep(1)
    }
    if (first != null) {
      out += first
      var more = completed.poll()
      while (more != null) { out += more; more = completed.poll() }
    }
    out.map {
      case (id, Success(costs)) => pendingCount.decrementAndGet(); (id, costs)
      case (_, Failure(e)) =>
        pendingCount.decrementAndGet()
        throw new RuntimeException("objective evaluation job failed", e)
    }.toSeq
  }

  override def capacityHint: Option[(Int, Int)] =
    Some((spark.sparkContext.defaultParallelism, 1))

  override def shutdown(): Unit = pool.shutdown()
}
