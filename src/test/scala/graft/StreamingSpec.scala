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

  test("TTL-bounded lifecycle state evicts settled attacks once the watermark passes") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[LifeEvent]
    val ttlMs = 3600L * 1000 // 1 hour past an attack's last event
    val updates = input.toDS().withWatermark("ts", "0 seconds")
      .groupByKey(_.attack_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout())(
        StreamingPipeline.lifecycleFnTtl(ttlMs))
    val q = updates.writeStream.format("memory").queryName("life_ttl")
      .outputMode("update").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: attack 1 starts and stops
    input.addData(
      LifeEvent(1L, is_stop = false, "2026-01-01T00:00:00", ts("2026-01-01 00:00:00")),
      LifeEvent(1L, is_stop = true, "2026-01-01T00:05:00", ts("2026-01-01 00:05:00")))
    q.processAllAvailable()
    // batch 2: a different attack 3h later advances the watermark far past
    // attack 1's timeout (00:05 + 1h); batch 3 gives the timeout a batch to fire
    input.addData(
      LifeEvent(2L, is_stop = false, "2026-01-01 03:00:00", ts("2026-01-01 03:00:00")))
    q.processAllAvailable()
    input.addData(
      LifeEvent(2L, is_stop = false, "2026-01-01 03:10:00", ts("2026-01-01 03:10:00")))
    q.processAllAvailable()

    // attack 1 resolved correctly before eviction
    val byId = spark.table("life_ttl").collect()
      .groupBy(_.getAs[Long]("attack_id")).view.mapValues(_.last).toMap
    assert(byId(1L).getAs[Int]("attack_ongoing") == 0)
    assert(byId(1L).getAs[String]("attack_end_date") == "2026-01-01T00:05:00")
    // state bounded: only attack 2 survives the TTL horizon
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    assert(stateRows == 1, s"expected 1 live state row after eviction, saw $stateRows")
  }

  test("TTL lifecycle survives a batch of purely-late events (timeout clamped to watermark)") {
    implicit val sql = spark.sqlContext
    // without no-data batches the late-row filter lags one batch behind the
    // eviction watermark (SPARK-40925 split), exposing the clamp scenario;
    // restored in the finally below so a mid-test failure can't leak the
    // disabled conf into later tests sharing the session
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
    val input = MemoryStream[LifeEvent]
    val ttlMs = 3600L * 1000
    val updates = input.toDS().withWatermark("ts", "0 seconds")
      .groupByKey(_.attack_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout())(
        StreamingPipeline.lifecycleFnTtl(ttlMs))
    val q = updates.writeStream.format("memory").queryName("life_late")
      .outputMode("update").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // Spark filters late rows against the PREVIOUS batch's watermark but
    // evicts state (and validates timeouts) against the CURRENT one — so a
    // row can pass the late filter while its ts+ttl sits behind the
    // eviction watermark. batch 1: watermark(after) = 00:00.
    input.addData(
      LifeEvent(1L, is_stop = false, "2026-01-01T00:00:00", ts("2026-01-01 00:00:00")))
    q.processAllAvailable()
    // batch 2 jumps event time: watermark(after) = 10:00
    input.addData(
      LifeEvent(2L, is_stop = false, "2026-01-01T10:00:00", ts("2026-01-01 10:00:00")))
    q.processAllAvailable()
    // batch 3: ts 00:30 passes the late filter (> batch-1 watermark 00:00)
    // but 00:30 + 1h TTL = 01:30 <= eviction watermark 10:00 — an
    // unclamped setTimeoutTimestamp throws and kills the query here
    input.addData(
      LifeEvent(7L, is_stop = false, "2026-01-01T00:30:00", ts("2026-01-01 00:30:00")))
    q.processAllAvailable()
    assert(q.exception.isEmpty, s"query died on late input: ${q.exception}")
    val byId = spark.table("life_late").collect()
      .groupBy(_.getAs[Long]("attack_id")).view.mapValues(_.last).toMap
    assert(byId(7L).getAs[Int]("attack_ongoing") == 1)
    q.stop()
    } finally spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
  }

  test("streamed route converges to the batch Router.route output (lifecycle applied)") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.TranscriptStore.table(spark, dir)
    val srcPath = Files.createTempDirectory("graft-conv-src").toString
    val outPath = Files.createTempDirectory("graft-conv-out").toString
    val ckpt = Files.createTempDirectory("graft-conv-ckpt").toString

    // two arrival phases so lifecycle stops land in LATER micro-batches
    // than their starts (turn parity splits start/stop pairs arbitrarily)
    all.filter(col("turn_idx") % 2 === 0).write.mode("append").parquet(srcPath)
    val q1 = StreamingPipeline.routeStream(spark, srcPath, outPath, ckpt)
    q1.processAllAvailable(); q1.stop()
    all.filter(col("turn_idx") % 2 === 1).write.mode("append").parquet(srcPath)
    val q2 = StreamingPipeline.routeStream(spark, srcPath, outPath, ckpt)
    q2.processAllAvailable(); q2.stop()

    val batchOut = Files.createTempDirectory("graft-conv-batch").toString
    graft.operators.Router.route(spark, dir, batchOut)
    val expected = graft.operators.Router.readRouted(spark, batchOut)
    val streamed = StreamingPipeline.readRoutedStream(spark, outPath)
    // full-row equality INCLUDING the lifecycle columns (attack_ongoing,
    // attack_end_date) — everything cast to string to erase partition-dir
    // type inference differences between the two sink layouts
    val cols = expected.columns.toSet.intersect(streamed.columns.toSet).toSeq.sorted
    assert(cols.contains("attack_ongoing") && cols.contains("attack_end_date"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(c => col(c).cast("string").as(c)): _*)
    assert(streamed.count() == expected.count())
    assert(norm(streamed).except(norm(expected)).count() == 0)
    assert(norm(expected).except(norm(streamed)).count() == 0)
    // and the stream really did close attacks (not all-ongoing as before)
    assert(streamed.filter(col("record_type") === "attacks" &&
      col("attack_ongoing") === 0).count() > 0)
  }

  test("writeRoutedBatch replay is idempotent: records, facts and resolved attacks") {
    val dir = "/root/testdata/sf0.001"
    val outPath = Files.createTempDirectory("graft-routed-replay").toString
    val exploded = StreamingPipeline.streamRecordsAll(spark,
      graft.sources.TranscriptStore.table(spark, dir))
    val b0 = exploded.filter(col("turn_idx") % 2 === 0)
    val b1 = exploded.filter(col("turn_idx") % 2 === 1)
    StreamingPipeline.writeRoutedBatch(outPath)(b0, 0L)
    StreamingPipeline.writeRoutedBatch(outPath)(b1, 1L)
    val resolved = StreamingPipeline.readRoutedStream(spark, outPath)
    val before = resolved.count()
    val closedBefore = resolved.filter(col("attack_ongoing") === 0).count()
    // sink-side crash replay: batch 1 delivered again with the same rows
    StreamingPipeline.writeRoutedBatch(outPath)(b1, 1L)
    val after = StreamingPipeline.readRoutedStream(spark, outPath)
    assert(after.count() == before)
    assert(after.filter(col("attack_ongoing") === 0).count() == closedBefore)
    graft.operators.Router.rmrf(java.nio.file.Paths.get(outPath))
  }

  test("a micro-batch's resolve rewrites ONLY its touched resolved buckets") {
    val dir = "/root/testdata/sf0.001"
    val outPath = Files.createTempDirectory("graft-routed-incr").toString
    val exploded = StreamingPipeline.streamRecordsAll(spark,
      graft.sources.TranscriptStore.table(spark, dir))
    // batch 0: everything -> the resolved sink covers many buckets
    StreamingPipeline.writeRoutedBatch(outPath)(exploded, 0L)
    val resolvedRoot = java.nio.file.Paths.get(s"$outPath/_resolved/record_type=attacks")
    def bucketFiles(): Map[String, Set[String]] = {
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(resolvedRoot)
      try ls.iterator().asScala
        .filter(_.getFileName.toString.startsWith("rbucket="))
        .map { d =>
          val fs = java.nio.file.Files.list(d)
          try d.getFileName.toString ->
            fs.iterator().asScala.map(_.getFileName.toString)
              .filter(_.endsWith(".parquet")).toSet
          finally fs.close()
        }.toMap
      finally ls.close()
    }
    val before = bucketFiles()
    assert(before.size > 1, s"expected multiple resolved buckets, got ${before.keySet}")
    // batch 1: lifecycle facts touching exactly ONE bucket
    val target = exploded
      .filter(col("record_type") === "attacks" && col("attack_id") =!= 0L)
      .select(pmod(col("attack_id"), lit(16)).cast("int")).head.getInt(0)
    val b1 = exploded.filter(col("record_type").isin("attacks", "_stop") &&
      col("attack_id") =!= 0L && pmod(col("attack_id"), lit(16)) === target)
    assert(b1.count() > 0)
    StreamingPipeline.writeRoutedBatch(outPath)(b1, 1L)
    val after = bucketFiles()
    assert(after.keySet == before.keySet)
    before.keys.filterNot(_ == s"rbucket=$target").foreach { k =>
      assert(after(k) == before(k), s"untouched resolved bucket $k was rewritten")
    }
    assert(after(s"rbucket=$target") != before(s"rbucket=$target"),
      "the touched bucket was not rewritten")
    graft.operators.Router.rmrf(java.nio.file.Paths.get(outPath))
  }

  test("a first batch of only _stop rows cannot crash the resolve (empty-sink guard)") {
    val dir = "/root/testdata/sf0.001"
    val outPath = Files.createTempDirectory("graft-routed-stoponly").toString
    val exploded = StreamingPipeline.streamRecordsAll(spark,
      graft.sources.TranscriptStore.table(spark, dir))
    // batch 0: stops only — _attacks has no data files yet; the old
    // full-rewrite resolve threw on schema inference here (ADVICE r4)
    StreamingPipeline.writeRoutedBatch(outPath)(
      exploded.filter(col("record_type") === "_stop"), 0L)
    // batch 1: the rest; stops from batch 0 must still close their attacks
    StreamingPipeline.writeRoutedBatch(outPath)(
      exploded.filter(col("record_type") =!= "_stop"), 1L)
    val out = StreamingPipeline.readRoutedStream(spark, outPath)
    assert(out.count() > 0)
    assert(out.filter(col("record_type") === "attacks" &&
      col("attack_ongoing") === 0).count() > 0,
      "stops routed before their attacks did not close them")
    graft.operators.Router.rmrf(java.nio.file.Paths.get(outPath))
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

    val streamed = StreamingPipeline.readRoutedStream(spark, outPath)
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
    val afterPhase1 = StreamingPipeline.readRoutedStream(spark, outPath).count()

    // phase 2: more files arrive; a NEW query resumes from the checkpoint
    all.filter(col("turn_idx") % 2 === 1).write.mode("append").parquet(srcPath)
    val q2 = StreamingPipeline.routeStream(spark, srcPath, outPath, ckpt)
    q2.processAllAvailable(); q2.stop()

    val streamed = StreamingPipeline.readRoutedStream(spark, outPath)
    val batch = graft.operators.Pipeline.records(spark, dir)
    assert(streamed.count() > afterPhase1) // phase 2 actually added rows
    assert(streamed.count() == batch.count()) // no loss, no duplicates
    // every (turn, record_type) emitted exactly once across both restarts
    assert(streamed.select("conv_id", "turn_idx", "record_type").distinct().count()
      == streamed.count())
  }

  test("a replayed micro-batch rewrites its own partition: zero duplicates") {
    val dir = "/root/testdata/sf0.001"
    val src = graft.sources.TranscriptStore.table(spark, dir)
    val srcPath = Files.createTempDirectory("graft-replay-src").toString
    src.limit(500).write.mode("overwrite").parquet(srcPath)
    val outPath = Files.createTempDirectory("graft-replay-out").toString
    val ckpt = Files.createTempDirectory("graft-replay-ckpt").toString

    val q = StreamingPipeline.routeStream(spark, srcPath, outPath, ckpt)
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(outPath)
    val before = out.count()
    assert(before > 0)
    val batchIds = out.select("batch_id").distinct().collect()
      .map(_.getAs[Number](0).longValue()) // partition dirs infer as int

    // simulate a sink-side replay of the first batch: re-invoke the batch
    // writer with the SAME batchId and the same rows (as a crash between
    // the write and the checkpoint commit would)
    val bid = batchIds.min
    val replayRows = spark.read.parquet(s"$outPath/batch_id=$bid").cache()
    replayRows.count() // materialize before the overwrite clobbers the source
    StreamingPipeline.writeBatch(outPath)(replayRows, bid)
    replayRows.unpersist()

    val after = spark.read.parquet(outPath).count()
    assert(after == before, s"replay duplicated rows: $before -> $after")
    // and the per-turn uniqueness invariant still holds
    val dup = spark.read.parquet(outPath)
      .groupBy("conv_id", "turn_idx", "record_type").count()
      .filter(col("count") > 1).count()
    assert(dup == 0)
  }

  test("live socket source feeds the same exploded records as the batch path") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.sources.TranscriptStore.table(spark, dir)
      .orderBy("conv_id", "turn_idx").limit(300).collect()
    val sep = "\u0001"
    assert(rows.forall(r => !r.getString(3).contains(sep) && !r.getString(3).contains("\n")))

    // the store's ts is TIMESTAMP_NTZ -> collect yields LocalDateTime
    def tsMillis(r: org.apache.spark.sql.Row): Long = r.get(5) match {
      case t: java.sql.Timestamp => t.getTime
      case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }

    // the live-ingress analog of the reference's UDP/TCP listeners
    // (bbn_f5networks.rb:142-202): one line per datagram/turn
    val server = new java.net.ServerSocket(0)
    val feeder = new Thread(() => {
      val sock = server.accept()
      val w = new java.io.PrintWriter(sock.getOutputStream, true)
      rows.foreach { r =>
        w.println(Seq(r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
          r.getString(4), tsMillis(r)).mkString(sep))
      }
      w.flush()
    })
    feeder.setDaemon(true)
    feeder.start()

    val raw = spark.readStream.format("socket")
      .option("host", "localhost").option("port", server.getLocalPort).load()
    val parsed = raw.select(split(col("value"), sep).as("f"))
      .select(col("f")(0).as("conv_id"), col("f")(1).cast("int").as("turn_idx"),
        col("f")(2).as("role"), col("f")(3).as("text"), col("f")(4).as("tool"),
        timestamp_millis(col("f")(5).cast("long")).as("ts"))
    val q = StreamingPipeline.streamRecords(spark, parsed)
      .writeStream.format("memory").queryName("sockrecs").outputMode("append").start()

    // batch truth over the SAME rows (ts normalized to TimestampType)
    val batchRows = rows.toSeq.map(r => org.apache.spark.sql.Row(
      r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4),
      new java.sql.Timestamp(tsMillis(r))))
    val batchIn = spark.createDataFrame(
      spark.sparkContext.parallelize(batchRows), StreamingPipeline.transcriptSchema)
    val expected = graft.operators.Pipeline
      .explodedAll(graft.operators.Pipeline.healthFilter(batchIn,
        graft.sources.Transcripts.healthStrings(spark)),
        graft.sources.Transcripts.utcOffsets(spark))
      .filter(col("record_type") =!= "_stop")
    val expectedCount = expected.count()

    // the socket source has no end-of-stream marker: poll until the routed
    // count settles at the batch truth (or time out)
    val deadline = System.currentTimeMillis() + 60000
    var got = -1L
    while (got != expectedCount && System.currentTimeMillis() < deadline) {
      q.processAllAvailable()
      got = spark.table("sockrecs").count()
      if (got != expectedCount) Thread.sleep(200)
    }
    q.stop()
    server.close()
    assert(got == expectedCount, s"socket stream routed $got of $expectedCount records")
    val key = Seq("record_type", "conv_id", "turn_idx", "remote_log_payload")
    assert(spark.table("sockrecs").select(key.head, key.tail: _*)
      .except(expected.select(key.head, key.tail: _*)).count() == 0)
  }

  test("StreamMain drains a source directory to routed sinks + exact conv counts") {
    val dir = "/root/testdata/sf0.001"
    val srcPath = Files.createTempDirectory("graft-main-src").toString
    graft.sources.TranscriptStore.table(spark, dir).limit(2000)
      .write.mode("overwrite").parquet(srcPath)
    val outPath = Files.createTempDirectory("graft-main-out").toString
    graft.streaming.StreamMain.run(spark, srcPath, outPath, drain = true)
    assert(StreamingPipeline.readRoutedStream(spark, outPath).count() > 0)
    assert(StreamingPipeline.exactSinkCounts(spark, s"$outPath/_convpairs").count() > 0)
    graft.operators.Router.rmrf(java.nio.file.Paths.get(outPath))
  }

  test("streaming dedup drops redelivered payloads within the watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Int, String, String, String, java.sql.Timestamp)]
    val t = input.toDF().toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val q = StreamingPipeline.dedupStream(t, watermark = "10 minutes")
      .writeStream.format("memory").queryName("streamdedup")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: A delivered twice (same content, different turns) + B
    input.addData(
      ("c1", 0, "user", "payload A", "none", ts("2026-01-01 00:00:00")),
      ("c1", 1, "user", "payload A", "none", ts("2026-01-01 00:00:01")),
      ("c1", 2, "user", "payload B", "none", ts("2026-01-01 00:00:02")))
    q.processAllAvailable()
    // batch 2: A redelivered later but inside the watermark horizon
    input.addData(("c2", 0, "user", "payload A", "none", ts("2026-01-01 00:01:00")))
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("streamdedup").collect().map(_.getAs[String]("text")).toSeq
    assert(texts.sorted == Seq("payload A", "payload B"),
      s"expected one A and one B, got: $texts")
  }

  test("streaming sessionization carries state across micro-batches and matches batch") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Int, java.sql.Timestamp)]
    val t = input.toDF().toDF("conv_id", "turn_idx", "ts")
    val q = StreamingPipeline.sessionizeStream(spark, t, gapSec = 3600)
      .writeStream.format("memory").queryName("streamsess")
      .outputMode("update").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("a", 0, ts("2026-01-01 00:00:00")),
      ("a", 1, ts("2026-01-01 00:30:00")),   // same session
      ("b", 0, ts("2026-01-01 00:00:00")))
    val rows2 = Seq(
      ("a", 2, ts("2026-01-01 02:00:00")),   // gap > 1h ACROSS batches -> new session
      ("a", 3, ts("2026-01-01 02:10:00")),
      ("b", 1, ts("2026-01-01 01:00:00")))   // exactly 3600s -> same session
    input.addData(rows: _*)
    q.processAllAvailable()
    input.addData(rows2: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("streamsess")
      .select("conv_id", "turn_idx", "session_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val batch = graft.operators.ConversationOps
      .sessionize((rows ++ rows2).toDF("conv_id", "turn_idx", "ts"), gapSec = 3600)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got == batch, s"stream $got vs batch $batch")
    // the eviction-stable key equals the session's first event time
    val sess2Start = spark.table("streamsess")
      .filter(col("conv_id") === "a" && col("turn_idx") === 2)
      .collect()(0).getAs[Long]("session_start_us")
    assert(sess2Start == ts("2026-01-01 02:00:00").getTime * 1000L)
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

  test("exact streaming distinct-conv counts: batch parity and replay idempotence") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val stateDir = java.nio.file.Files.createTempDirectory("graft-exact-convs").toString
    val records = graft.operators.Pipeline.records(spark, dir)

    // two disjoint "micro-batches" by conv hash, fed through the foreachBatch fn
    val b0 = records.filter(abs(hash(col("conv_id"))) % 2 === 0)
    val b1 = records.filter(abs(hash(col("conv_id"))) % 2 === 1)
    StreamingPipeline.exactConvPairsBatch(stateDir)(b0, 0L)
    StreamingPipeline.exactConvPairsBatch(stateDir)(b1, 1L)
    // sink-side crash replay: batch 1 runs again against the same state dir
    StreamingPipeline.exactConvPairsBatch(stateDir)(b1, 1L)

    val exact = StreamingPipeline.exactSinkCounts(spark, stateDir)
    val truth = records
      .select(window(col("ts"), "1 minute").getField("start").as("window_start"),
        col("record_type"), col("facility"), col("severity"), col("conv_id"))
      .groupBy("window_start", "record_type", "facility", "severity")
      .agg(countDistinct(col("conv_id")).as("n_convs"))
    assert(exact.count() == truth.count())
    assert(exact.except(truth).count() == 0 && truth.except(exact).count() == 0)
    graft.operators.Router.rmrf(java.nio.file.Paths.get(stateDir))
  }

  test("pair-state compaction folds batch dirs to one and preserves exact counts") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val stateDir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    def batchDirs() = {
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(stateDir))
      try {
        val it = ls.iterator()
        var v = Vector.empty[String]
        while (it.hasNext) { val p = it.next(); v :+= p.getFileName.toString }
        v.filter(_.startsWith("batch_id="))
      } finally ls.close()
    }
    val records = graft.operators.Pipeline.records(spark, dir)
    val b0 = records.filter(abs(hash(col("conv_id"))) % 2 === 0)
    val b1 = records.filter(abs(hash(col("conv_id"))) % 2 === 1)
    StreamingPipeline.exactConvPairsBatch(stateDir)(b0, 0L)
    StreamingPipeline.exactConvPairsBatch(stateDir)(b1, 1L)
    val before = StreamingPipeline.exactSinkCounts(spark, stateDir).collect()
      .map(r => (r.get(0), r.getString(1), r.get(2), r.get(3)) -> r.getLong(4)).toMap

    StreamingPipeline.compactConvPairs(spark, stateDir)
    assert(batchDirs().size == 1 && batchDirs().head.startsWith("batch_id=compact-"),
      s"expected one compact dir, saw ${batchDirs()}")
    val after = StreamingPipeline.exactSinkCounts(spark, stateDir).collect()
      .map(r => (r.get(0), r.getString(1), r.get(2), r.get(3)) -> r.getLong(4)).toMap
    assert(after == before, "compaction changed the exact counts")

    // a batch REPLAYED after its dirs were folded (older id than the compact
    // epoch) must still compact cleanly — the generation suffix keeps the
    // fold's output path distinct from its inputs
    StreamingPipeline.exactConvPairsBatch(stateDir)(b0, 0L)
    StreamingPipeline.compactConvPairs(spark, stateDir)
    assert(batchDirs().size == 1)
    val after2 = StreamingPipeline.exactSinkCounts(spark, stateDir).collect()
      .map(r => (r.get(0), r.getString(1), r.get(2), r.get(3)) -> r.getLong(4)).toMap
    assert(after2 == before, "post-replay compaction changed the exact counts")
    graft.operators.Router.rmrf(java.nio.file.Paths.get(stateDir))
  }

  test("TTL-bounded sessionization evicts idle conversations; session key survives") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Int, java.sql.Timestamp)]
    val t = input.toDF().toDF("conv_id", "turn_idx", "ts")
    // TTL == gap (1h): eviction can only drop conversations whose next turn
    // would have started a new session anyway
    val q = StreamingPipeline.sessionizeStream(spark, t, gapSec = 3600,
        stateTtlMs = Some(3600L * 1000))
      .writeStream.format("memory").queryName("sess_ttl")
      .outputMode("update").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(("a", 0, ts("2026-01-01 00:00:00")))
    q.processAllAvailable()
    // conv b three hours later advances the watermark past a's TTL; the
    // next batch gives a's timeout a batch to fire
    input.addData(("b", 0, ts("2026-01-01 03:00:00")))
    q.processAllAvailable()
    input.addData(("b", 1, ts("2026-01-01 03:10:00")))
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    assert(stateRows == 1, s"expected only conv b live after eviction, saw $stateRows")
    // a's post-eviction turn: dense counter restarts (1), but the
    // eviction-stable session key equals the turn's own event time, exactly
    // what the unbounded run would assign for a > gap jump
    input.addData(("a", 1, ts("2026-01-01 03:20:00")))
    q.processAllAvailable()
    q.stop()
    val a1 = spark.table("sess_ttl")
      .filter(col("conv_id") === "a" && col("turn_idx") === 1).collect()(0)
    assert(a1.getAs[Int]("session_idx") == 1)
    assert(a1.getAs[Long]("session_start_us") ==
      ts("2026-01-01 03:20:00").getTime * 1000L)
  }
}
