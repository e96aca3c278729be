package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for individual queries. Not part of the contract. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    args.drop(1).foreach { q =>
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        val tc = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val t1 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        val te = (System.nanoTime() - t1) / 1e9
        spark.catalog.clearCache()
        println(f"[time] $q run$r: count ${tc}%.1f s (rows=$n), exec ${te}%.1f s")
      }
    }
    spark.stop()
  }
}
