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
        println(f"[time] $q run$r: ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
      }
    }
    spark.stop()
  }
}
