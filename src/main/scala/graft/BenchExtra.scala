package graft

import org.apache.spark.sql.SparkSession

/** Extra, non-contract benchmark harness (guide §1.4): isolates individual
  * declared queries through the noop sink with first/warm timings, process-CPU
  * seconds and codegen-compile accounting, so optimization work can iterate
  * query-by-query without re-running the full frozen Bench suite. The frozen
  * driver contract lives in Bench.scala; numbers from here are cited in
  * OPTIMIZATION_r06.md as working measurements only.
  *
  * Usage: runMain graft.BenchExtra <sfDir> <mode> [runs] [query ...]
  *   mode  = count | exec (noop sink) | both
  *   runs  = repeats per query (default 2: first + warm)
  *   query = query names (default: all, in name order)
  * Env: SPARK_GRAFT_CPUS (default 32) — master local[N], shuffle.partitions=N
  * (the same session shape the frozen Bench children use).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("both")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val wanted = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    operators.Pipeline.configure(spark)
    graft.sources.TranscriptStore.table(spark, sfDir) // materialization = setup

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.isEmpty || wanted.contains(n))

    def timeOne(name: String, m: String): Unit = {
      import org.apache.spark.metrics.source.CodegenMetrics._
      val fn = SparkEntry.queries(name)
      (1 to runs).foreach { r =>
        spark.sparkContext.setJobDescription(s"$name [$m run $r]")
        val cg0 = METRIC_COMPILATION_TIME.getCount
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        if (m == "count") fn(spark, sfDir).count()
        else fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        val cg = METRIC_COMPILATION_TIME.getCount - cg0
        spark.catalog.clearCache()
        operators.Intermediates.release(spark)
        println(f"EXTRA=$name,$m,$r,$wall%.3f,$cpu%.1f,$cg")
      }
    }
    names.foreach { n =>
      if (mode == "count" || mode == "both") timeOne(n, "count")
      if (mode == "exec" || mode == "both") timeOne(n, "exec")
    }
    spark.stop()
  }
}
