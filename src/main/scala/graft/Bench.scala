package graft

import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._
import scala.sys.process.{Process, ProcessLogger}

/** Benchmark main: times every SparkEntry query at the target scale factor
  * and prints ONE JSON line (raw on stdout — `run / outputStrategy :=
  * StdoutOutput` in build.sbt keeps sbt from prefixing it with `[info]`,
  * which left BENCH_r01/r02 unparsed by the driver).
  *
  * Measurement protocol (round-3 rework — round-2 numbers were distorted
  * up to ~13× by shared-JVM state and box contention):
  *   - Queries are partitioned into groups (ML / streaming / dedup / core)
  *     and each group runs in its OWN child JVM with the same pinned heap
  *     and module options as the parent, so MLlib's internal RDD caches,
  *     streaming state stores, and heap fragmentation from one group can
  *     never distort another's numbers.
  *   - Per query: one warm-up execution (Janino codegen, class loading,
  *     parquet footer reads — costs that amortize to zero on a long-lived
  *     cluster), then `runs` timed executions; the MEDIAN is reported.
  *   - Between every execution the Dataset cache AND all persistent RDDs
  *     are dropped (`spark.catalog.clearCache()` misses MLlib's internal
  *     RDD persists — the round-2 q_ann_ivf leak).
  *   - If child JVMs cannot be spawned in the sandbox, the parent falls
  *     back to running every group in-process with the same protocol.
  */
object Bench {

  private val TimedRuns = 3
  private val GroupMarker = "GRAFT_BENCH_GROUP:"

  /** Isolation groups: heavyweight/stateful families get their own JVM. */
  private def groupOf(name: String): String =
    if (name.startsWith("q_ann")) "ml"
    else if (name.startsWith("q_stream") || name.endsWith("_stream")) "stream"
    else if (name.startsWith("q_dedup") || name == "q_embed_neardup") "dedup"
    else "core"

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("--child") => childMain(args.drop(1))
    case _               => parentMain()
  }

  // ---------------------------------------------------------------- parent

  private def parentMain(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val groups = names.groupBy(groupOf).toSeq.sortBy(_._1)

    val merged = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for ((gname, qnames) <- groups) {
      val res = runGroupChild(gname, qnames, sfDir, cpus)
        .getOrElse {
          System.err.println(s"[bench] child JVM for group '$gname' failed; running in-process")
          runGroupInProcess(qnames, sfDir, cpus)
        }
      res.foreach { case (k, v) => merged(k) = v }
    }

    val qs = names
      .map(n => s"\"" + n + "\":" + merged.getOrElse(n, -1.0))
      .mkString("{", ",", "}")
    val total = names.flatMap(merged.get).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/graft_bench_$tag.json"), json)
  }

  /** Spawn one child JVM (same java, classpath, module opens, pinned heap)
    * for a query group; parse its GRAFT_BENCH_GROUP line. Child stderr and
    * non-marker stdout are relayed to our stderr so Spark noise can never
    * collide with the parent's single JSON stdout line.
    */
  private def runGroupChild(
      gname: String,
      qnames: Seq[String],
      sfDir: String,
      cpus: String): Option[Map[String, Double]] =
    try {
      val java = System.getProperty("java.home") + "/bin/java"
      val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
        .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
          a.startsWith("-X") || a.startsWith("-D"))
      val cp = System.getProperty("java.class.path")
      val cmd = Seq(java) ++ jvmArgs ++
        Seq("-cp", cp, "graft.Bench", "--child", sfDir, cpus) ++ qnames
      var parsed: Option[Map[String, Double]] = None
      val logger = ProcessLogger(
        out =>
          if (out.startsWith(GroupMarker))
            parsed = Some(parseGroupJson(out.stripPrefix(GroupMarker)))
          else System.err.println(out),
        err => System.err.println(err))
      val rc = Process(cmd).!(logger)
      // A truncated/corrupted marker line would parse to a partial map whose
      // missing queries read as -1.0 — indistinguishable from real failures
      // (ADVICE r3 #4). Only a parse covering exactly the requested names
      // counts; anything else is a failed child and the caller falls back.
      parsed.filter(_ => rc == 0).filter { m =>
        val ok = m.keySet == qnames.toSet
        if (!ok) System.err.println(
          s"[bench] child for '$gname' returned keys ${m.keySet.toSeq.sorted.mkString(",")} " +
            s"!= requested ${qnames.sorted.mkString(",")}; treating as failed")
        ok
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] spawn failed for '$gname': ${e.getMessage}")
      None
    }

  /** Parse the child's flat {"name":sec,...} line without a JSON library. */
  private def parseGroupJson(s: String): Map[String, Double] =
    """"([^"]+)"\s*:\s*(-?[0-9.eE+]+)""".r
      .findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap

  // ----------------------------------------------------------------- child

  private def childMain(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val qnames = args.drop(2).toSeq
    val results = runGroupInProcess(qnames, sfDir, cpus)
    val line = results
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString(GroupMarker + "{", ",", "}")
    println(line)
  }

  private def runGroupInProcess(
      qnames: Seq[String],
      sfDir: String,
      cpus: String): Seq[(String, Double)] = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    val out = qnames.map { name =>
      val fn = queries(name)
      try { fn(spark, sfDir).count(); dropAllCaches(spark) } // warm-up
      catch { case _: Throwable => () }
      val times = (1 to TimedRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        dropAllCaches(spark)
        if (ok) Some(dt) else None
      }
      name -> (if (times.isEmpty) -1.0 else median(times))
    }
    spark.stop()
    out
  }

  /** Dataset cache + persistent RDDs (MLlib KMeans persists RDDs that
    * `catalog.clearCache()` does not touch — the round-2 bench leak). */
  private def dropAllCaches(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
}
