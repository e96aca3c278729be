package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingPipeline
import graft.streaming.StreamingPipeline.LifeEvent

/** Structured Streaming specs: the stateful W3 lifecycle over MemoryStream
  * micro-batches, and the file-stream parse path against the batch result.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  test("flatMapGroupsWithState lifecycle: start then stop across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[LifeEvent]
    val updates = input.toDS().groupByKey(_.attack_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
        StreamingPipeline.lifecycleFn)
    val q = updates.writeStream.format("memory").queryName("life")
      .outputMode("update").start()

    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$s%02d")
    // batch 1: two starts (ids 1, 2) + an extra duplicate start for id 2
    input.addData(
      LifeEvent(1L, is_stop = false, "2026-01-01T00:00:00", ts(0)),
      LifeEvent(2L, is_stop = false, "2026-01-01T00:00:01", ts(1)),
      LifeEvent(2L, is_stop = false, "2026-01-01T00:00:02", ts(2)))
    q.processAllAvailable()
    // batch 2: stops for 1 (closes), 2 (ambiguous: 2 starts), 9 (orphan)
    input.addData(
      LifeEvent(1L, is_stop = true, "2026-01-01T00:05:00", ts(10)),
      LifeEvent(2L, is_stop = true, "2026-01-01T00:05:01", ts(11)),
      LifeEvent(9L, is_stop = true, "2026-01-01T00:05:02", ts(12)))
    q.processAllAvailable()
    q.stop()

    val byId = spark.table("life").collect()
      .groupBy(_.getAs[Long]("attack_id"))
      .view.mapValues(_.last).toMap
    assert(byId(1L).getAs[Int]("attack_ongoing") == 0)
    assert(byId(1L).getAs[String]("attack_end_date") == "2026-01-01T00:05:00")
    assert(byId(2L).getAs[Int]("attack_ongoing") == 1) // 2 starts -> log-only
    assert(byId(2L).getAs[String]("attack_end_date") == "")
    assert(byId(9L).getAs[Int]("attack_ongoing") == 1) // orphan stop
    assert(byId(9L).getAs[Int]("n_starts") == 0)
  }

  test("file-stream parse produces the same routed records as the batch path") {
    val dir = "/root/testdata/sf0.001"
    val src = graft.sources.TranscriptStore.table(spark, dir)
    val srcPath = Files.createTempDirectory("graft-stream-src").toString
    src.write.mode("overwrite").parquet(srcPath)
    val outPath = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString

    val q = StreamingPipeline.routeStream(spark, srcPath, outPath, ckpt)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(outPath)
    val batch = graft.operators.Pipeline.records(spark, dir)
    assert(streamed.count() == batch.count())
    val key = Seq("record_type", "conv_id", "turn_idx", "remote_log_payload")
    assert(streamed.select(key.head, key.tail: _*)
      .except(batch.select(key.head, key.tail: _*)).count() == 0)
  }

  test("file stream resumes from checkpoint across restarts without duplicates") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.TranscriptStore.table(spark, dir)
    val srcPath = Files.createTempDirectory("graft-resume-src").toString
    val outPath = Files.createTempDirectory("graft-resume-out").toString
    val ckpt = Files.createTempDirectory("graft-resume-ckpt").toString

    // phase 1: first half of the data, then the query "dies"
    all.filter(col("turn_idx") % 2 === 0).write.mode("append").parquet(srcPath)
    val q1 = StreamingPipeline.routeStream(spark, srcPath, outPath, ckpt)
    q1.processAllAvailable(); q1.stop()
    val afterPhase1 = spark.read.parquet(outPath).count()

    // phase 2: more files arrive; a NEW query resumes from the checkpoint
    all.filter(col("turn_idx") % 2 === 1).write.mode("append").parquet(srcPath)
    val q2 = StreamingPipeline.routeStream(spark, srcPath, outPath, ckpt)
    q2.processAllAvailable(); q2.stop()

    val streamed = spark.read.parquet(outPath)
    val batch = graft.operators.Pipeline.records(spark, dir)
    assert(streamed.count() > afterPhase1) // phase 2 actually added rows
    assert(streamed.count() == batch.count()) // no loss, no duplicates
    // every (turn, record_type) emitted exactly once across both restarts
    assert(streamed.select("conv_id", "turn_idx", "record_type").distinct().count()
      == streamed.count())
  }

  test("watermarked windowed sink counts run in append mode") {
    implicit val sql = spark.sqlContext
    // reuse the real parse over a memory stream of raw transcript rows
    val input = MemoryStream[(String, Int, String, String, String, java.sql.Timestamp)]
    val t = input.toDF().toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val counts = StreamingPipeline.sinkCounts(
      StreamingPipeline.streamRecords(spark, t), watermark = "0 seconds")
    val q = counts.writeStream.format("memory").queryName("sinkcounts")
      .outputMode("append").start()
    val syStart = "<134>x b info tmm1: [hostname=b.lab bigip_mgmt_ip=172.16.21.41 " +
      "date_time=2026-01-01 00:00:05 dos_attack_id=5 dos_attack_event=Attack Started " +
      "severity=2 errdefs_msg_name=Network DoS Event]"
    input.addData(("c1", 0, "user", syStart, "none",
      java.sql.Timestamp.valueOf("2026-01-01 00:00:05")))
    q.processAllAvailable()
    // advance the watermark past the first window so it can emit
    input.addData(("c1", 1, "user", syStart.replace("00:00:05", "00:10:00"), "none",
      java.sql.Timestamp.valueOf("2026-01-01 00:10:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sinkcounts").collect()
    assert(rows.exists(r => r.getAs[String]("record_type") == "attacks" &&
      r.getAs[Long]("n_rows") == 1L))
  }
}
