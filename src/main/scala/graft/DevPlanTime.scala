package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: time plan construction + analysis + optimization of the
  * big parse plans without executing them (driver-side cost that every
  * action pays). Not part of the contract.
  */
object DevPlanTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    operators.Pipeline.configure(spark)
    sources.TranscriptStore.table(spark, dir)
    (1 to 4).foreach { r =>
      var t0 = System.nanoTime()
      val df = operators.Pipeline.records(spark, dir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.assertAnalyzed()
      val tAnalyze = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.optimizedPlan
      val tOpt = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPhys = (System.nanoTime() - t0) / 1e9
      println(f"[devplan] run$r records(): build $tBuild%.2f analyze $tAnalyze%.2f optimize $tOpt%.2f physical $tPhys%.2f s")
    }
    spark.stop()
  }
}
