package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: scan partition counts of the materialized stores at a
  * given core count (diagnoses scan-parallelism ceilings in the scaling
  * legs). Not part of the contract.
  */
object DevParts {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(16)
    val rep = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    operators.Pipeline.configure(spark)
    val t = sources.TranscriptStore.table(spark, dir, rep)
    println(s"[devparts] cpus=$cpus rep=$rep scanPartitions=${t.rdd.getNumPartitions} " +
      s"defaultParallelism=${spark.sparkContext.defaultParallelism} " +
      s"maxPartitionBytes=${spark.conf.get("spark.sql.files.maxPartitionBytes")}")
    spark.stop()
  }
}
