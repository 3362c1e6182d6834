package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Task-metric probe for adjudicating bench suspects (VERDICT r15 #1):
  * runs named registry queries N times each (one untimed warm-up) and
  * prints, per run, the wall time PLUS the summed executor-side task
  * metrics — GC time, run time, spill, peak execution memory — so a
  * load-amplification claim ("this row degrades 2.7x under contention
  * because of GC pressure from per-row array materialization") is a
  * measurement, not a story. Run it twice — once on an idle box, once
  * with induced load — and diff the gcTime/runTime ratios: scheduler
  * contention inflates wall time with task metrics flat; allocation
  * pressure inflates gcTime superlinearly.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.TaskMetricsProbe \
  *     q_triangles 3 /root/testdata/sf0.1"
  */
object TaskMetricsProbe {
  def main(args: Array[String]): Unit = {
    val queries = args.headOption.map(_.split(',').toSeq).getOrElse(Seq("q_triangles"))
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Session, cache drop, and loadavg come from Bench itself (code-review
    // r16): a hand-maintained copy would silently measure a different
    // engine configuration than the bench these numbers adjudicate.
    val spark = graft.Bench.benchSession(cpus)

    val gc = new LongAdder; val run = new LongAdder
    val spillMem = new LongAdder; val spillDisk = new LongAdder
    val peak = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          gc.add(m.jvmGCTime); run.add(m.executorRunTime)
          spillMem.add(m.memoryBytesSpilled); spillDisk.add(m.diskBytesSpilled)
          peak.getAndAccumulate(m.peakExecutionMemory, math.max)
          tasks.increment()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (q <- queries) {
      val fn = SparkEntry.queries(q)
      fn(spark, dir).count() // warm-up, untimed
      drop(spark)
      // drain the warm-up's TaskEnd events too, or they leak into run 1
      Thread.sleep(500)
      (1 to n).foreach { i =>
        gc.reset(); run.reset(); spillMem.reset(); spillDisk.reset()
        peak.set(0); tasks.reset()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously (the bus is private[spark]);
        // a beat is enough in local mode, and the tool is diagnostic-only
        Thread.sleep(500)
        println(f"""{"query":"$q","run":$i,"wall_sec":$wall%.3f,""" +
          s""""gc_ms":${gc.sum},"task_run_ms":${run.sum},""" +
          s""""spill_mem_b":${spillMem.sum},"spill_disk_b":${spillDisk.sum},""" +
          s""""peak_exec_mem_b":${peak.get},"n_tasks":${tasks.sum},""" +
          s""""loadavg":"${loadavg()}"}""")
        drop(spark)
      }
    }
    spark.stop()
  }

  private def loadavg(): String = graft.Bench.loadavg()

  private def drop(spark: SparkSession): Unit = graft.Bench.dropAllCaches(spark)
}
