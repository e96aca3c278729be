package graft.streaming

import org.apache.spark.sql.SparkSession

/** Production streaming entry: the spark-submit composition of the streamed
  * route (parse -> bucketed routed sinks with the incremental W3 lifecycle
  * MERGE, see [[StreamingPipeline.writeRoutedBatch]]) plus the exact
  * per-sink distinct-conversation counts maintained as idempotent per-batch
  * pair state ([[StreamingPipeline.exactConvPairsBatch]]) — the streamed
  * analog of `scripts/submit.sh Bench`'s batch route. Reference contrast:
  * the plugin's runtime loop is one blocking thread per socket
  * (bbn_f5networks.rb:142-202); here both queries are checkpointed
  * Structured Streaming jobs that restart exactly-once from their sinks.
  *
  * Usage (see scripts/submit.sh):
  *   streaming.StreamMain <sourceDir> <outRoot> [--drain]
  *
  * `sourceDir` is a parquet transcripts directory watched as a file stream
  * (the sandbox stand-in for the socket ingress; the live-socket path is
  * spec-verified in StreamingSpec). Checkpoints and the exact-counts state
  * live under `outRoot/_checkpoints` and `outRoot/_convpairs`. `--drain`
  * processes everything currently available and exits (smoke/test mode);
  * without it both queries run until terminated.
  */
object StreamMain {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamMain <sourceDir> <outRoot> [--drain]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args(0), args(1), drain = args.contains("--drain"))
    finally spark.stop()
  }

  /** Start (and optionally drain) both streaming queries. Split from main
    * so specs drive it under the shared test session.
    */
  def run(spark: SparkSession, sourceDir: String, outRoot: String,
          drain: Boolean): Unit = {
    val route = StreamingPipeline.routeStream(spark, sourceDir, outRoot,
      s"$outRoot/_checkpoints/route")
    val counts = StreamingPipeline
      .streamRecords(spark, StreamingPipeline.streamTranscripts(spark, sourceDir))
      .writeStream
      .option("checkpointLocation", s"$outRoot/_checkpoints/convpairs")
      .foreachBatch(StreamingPipeline.exactConvPairsBatch(s"$outRoot/_convpairs") _)
      .start()
    if (drain) {
      route.processAllAvailable(); route.stop()
      counts.processAllAvailable(); counts.stop()
    } else {
      route.awaitTermination()
      counts.awaitTermination()
    }
  }
}
