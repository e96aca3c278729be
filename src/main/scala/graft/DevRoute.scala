package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for the route headline (not part of the
  * contract): times the staged-write pipeline stage by stage through the
  * noop sink so optimization work targets the real cost.
  * Usage: runMain graft.DevRoute [sfDir] [rep]
  */
object DevRoute {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    operators.Pipeline.configure(spark)
    val store = sources.TranscriptStore
    store.table(spark, dir, rep).count() // setup

    def time(name: String)(f: => Unit): Unit = {
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        f
        println(f"[devroute] $name run$r: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    val t = operators.Pipeline.healthFilter(store.table(spark, dir, rep),
      sources.Transcripts.healthStrings(spark))
    val offsets = sources.Transcripts.utcOffsets(spark)

    time("scan only (count text)") {
      t.select(length(col("text"))).agg(sum("length(text)")).head()
    }
    time("exploded noop") {
      operators.Pipeline.explodedAll(t, offsets)
        .write.mode("overwrite").format("noop").save()
    }
    time("exploded+sortWithin noop") {
      operators.Pipeline.explodedAll(t, offsets)
        .sortWithinPartitions("record_type", "tool", "attack_severity")
        .write.mode("overwrite").format("noop").save()
    }
    time("staged parquet write") {
      operators.Pipeline.explodedAll(t, offsets)
        .sortWithinPartitions("record_type", "tool", "attack_severity")
        .write.mode("overwrite").partitionBy("record_type", "tool")
        .parquet("/dev/shm/graft-devroute/staged")
    }
    // decompose phase 2 (the lifecycle rewrite)
    val staged = "/dev/shm/graft-devroute/staged"
    time("p2 read-back plan build") {
      val back = spark.read.parquet(staged)
      val lifeAgg = operators.Pipeline.lifeAggOf(operators.Pipeline.lifeFactsFromStaged(back))
      operators.Pipeline.applyLifecycleToAttacks(
        back.filter(col("record_type") === operators.Pipeline.Attacks).drop("record_type"),
        lifeAgg).queryExecution.executedPlan
    }
    time("p2 lifeAgg agg job (noop)") {
      val back = spark.read.parquet(staged)
      operators.Pipeline.lifeAggOf(operators.Pipeline.lifeFactsFromStaged(back))
        .write.mode("overwrite").format("noop").save()
    }
    time("p2 full rewrite write") {
      val back = spark.read.parquet(staged)
      val lifeAgg = operators.Pipeline.lifeAggOf(operators.Pipeline.lifeFactsFromStaged(back))
      operators.Pipeline.applyLifecycleToAttacks(
          back.filter(col("record_type") === operators.Pipeline.Attacks).drop("record_type"),
          lifeAgg)
        .write.mode("overwrite").partitionBy("tool", "attack_severity")
        .parquet("/dev/shm/graft-devroute/attacks")
    }
    operators.Router.rmrf(java.nio.file.Paths.get("/dev/shm/graft-devroute"))
    spark.stop()
  }
}
