package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.operators.Pipeline
import graft.sources.Transcripts

/** Structured Streaming variant of the pipeline (SURVEY.md §2.9).
  *
  * The stateless parse/normalize/explode is the SAME code as batch
  * (Pipeline.explodedAll — readStream swaps in transparently because the
  * plan is narrow); what changes is the lifecycle resolution: batch uses a
  * window over attack_id, streaming holds per-attack state in
  * flatMapGroupsWithState (W3) and aggregates with watermarked windows (W1).
  */
object StreamingPipeline {

  val transcriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** File-based streaming source over a transcripts parquet directory. */
  def streamTranscripts(spark: SparkSession, path: String): DataFrame = {
    Pipeline.configure(spark)
    spark.readStream.schema(transcriptSchema).parquet(path)
  }

  /** Streaming parse->explode INCLUDING the internal `_stop` rows (the
    * lifecycle facts the routed writer correlates per batch — the batch
    * analog is Router.route's staged `_stop` partition).
    */
  def streamRecordsAll(spark: SparkSession, transcripts: DataFrame): DataFrame = {
    val clean = Pipeline.healthFilter(transcripts, Transcripts.healthStrings(spark))
    Pipeline.explodedAll(clean, Transcripts.utcOffsets(spark))
  }

  /** Streaming parse->explode: identical operator graph to batch. */
  def streamRecords(spark: SparkSession, transcripts: DataFrame): DataFrame =
    streamRecordsAll(spark, transcripts).filter(col("record_type") =!= "_stop")

  /** W1: per-sink windowed aggregates with late-data handling — counts and
    * approximate distinct conversations per (1-minute window, record_type,
    * facility, severity). Exact countDistinct is not available under
    * watermarked append mode; HLL is the documented cheap variant
    * (SURVEY.md §2.7).
    */
  def sinkCounts(records: DataFrame, watermark: String = "10 minutes"): DataFrame =
    records
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"), col("record_type"),
        col("facility"), col("severity"))
      .agg(count("*").as("n_rows"),
        approx_count_distinct("conv_id").as("n_convs_approx"))

  /** EXACT streaming distinct-conv counts, the foreachBatch-maintained
    * state-table variant of sinkCounts (whose approx_count_distinct stays
    * the recommended default — HLL state is O(registers), this is
    * O(distinct pairs)). Each micro-batch writes its DISTINCT
    * (window, sink-group, conv_id) pairs into its own `batch_id=<id>`
    * directory with overwrite — the same idempotent-replay contract as
    * writeBatch — and the read side counts distinct conv_ids over all
    * batches. Replays rewrite their own partition and countDistinct
    * dedups across batches, so the counts are exactly-once without any
    * cross-batch anti-join in the hot path. At scale the state table is
    * an Iceberg table compacted by a maintenance job; the per-batch
    * append stays a narrow distinct of the batch.
    */
  def exactConvPairsBatch(stateDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch
      .select(window(col("ts"), "1 minute").getField("start").as("window_start"),
        col("record_type"), col("facility"), col("severity"), col("conv_id"))
      .distinct()
      .write.mode("overwrite").parquet(s"$stateDir/batch_id=$batchId")

  /** Exact per-sink distinct-conv counts over the maintained pair state. */
  def exactSinkCounts(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateDir)
      .groupBy("window_start", "record_type", "facility", "severity")
      .agg(countDistinct(col("conv_id")).as("n_convs"))

  /** Maintenance compaction for the pair state: fold every batch directory
    * present at call time into ONE distinct-pair directory and drop the
    * originals — the job that keeps the state's file count O(1) instead of
    * O(batches) over a stream's life (the read side lists every dir).
    *
    * Crash-safe by the same dedup that makes the counts exact: the
    * compacted dir only becomes visible at its _SUCCESS commit (before
    * that, only a hidden _temporary subtree exists), and until the source
    * dirs are deleted the pairs are merely DUPLICATED across compact +
    * originals — countDistinct dedups, so every crash window reads
    * correct; re-running converges. Batches arriving concurrently are
    * untouched (only the dirs listed at entry are folded). The compact
    * dir's partition value is non-numeric, so `batch_id` infers as string
    * afterwards — the count query never reads it.
    *
    * The target name carries a GENERATION suffix (`compact-<epoch>g<n>`)
    * strictly above every existing compact dir's, so the output path is
    * never one of the inputs — a replayed batch older than a prior
    * compact would otherwise make the fold read and overwrite the same
    * directory, which Spark rejects.
    */
  def compactConvPairs(spark: SparkSession, stateDir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(stateDir)
    if (!java.nio.file.Files.isDirectory(root)) return
    val ls = java.nio.file.Files.list(root)
    val dirs = try ls.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("batch_id="))
      .toVector finally ls.close()
    if (dirs.size < 2) return
    val names = dirs.map(_.getFileName.toString.stripPrefix("batch_id="))
    val epoch = names.map(_.stripPrefix("compact-").takeWhile(_.isDigit))
      .filter(_.nonEmpty).map(_.toLong).max
    val gen = names.filter(_.startsWith("compact-"))
      .map(_.dropWhile(_ != 'g').drop(1)).filter(_.nonEmpty)
      .map(_.toLong).maxOption.getOrElse(0L) + 1
    spark.read.parquet(dirs.map(_.toString): _*)
      .distinct()
      .write.mode("overwrite").parquet(s"$stateDir/batch_id=compact-${epoch}g$gen")
    dirs.foreach(d => graft.operators.Router.rmrf(d))
  }

  // ---- W3 streaming lifecycle: flatMapGroupsWithState ----

  case class LifeEvent(attack_id: Long, is_stop: Boolean, event_utc: String,
                       ts: java.sql.Timestamp)
  case class LifeState(nStarts: Int, startDate: String, endDate: String,
                       closed: Boolean)
  case class LifeUpdate(attack_id: Long, attack_ongoing: Int,
                        attack_start_date: String, attack_end_date: String,
                        n_starts: Int)

  /** The lifecycle transition shared by both state variants: starts
    * accumulate; a stop closes the attack iff exactly ONE start was seen
    * (hits.total==1, bbn_syslog.rb:271-324), otherwise it is a log-only
    * no-op.
    */
  private def applyLifeEvents(s0: LifeState, events: Seq[LifeEvent]): LifeState = {
    var s = s0
    events.sortBy(_.ts.getTime).foreach { e =>
      if (e.is_stop) {
        if (s.nStarts == 1) s = s.copy(endDate = e.event_utc, closed = true)
        // 0 or >1 starts: log-only in the reference; state unchanged
      } else {
        s = s.copy(nStarts = s.nStarts + 1,
          startDate = if (s.startDate.isEmpty) e.event_utc else s.startDate)
      }
    }
    s
  }

  /** Per-attack lifecycle state machine replicating the reference's ES
    * correlation. Emits the current resolution on every update. Unbounded
    * state (the reference's ES index also keeps every attack forever);
    * production deployments use `lifecycleFnTtl` to bound state.
    */
  def lifecycleFn(attackId: Long, events: Iterator[LifeEvent],
                  state: GroupState[LifeState]): Iterator[LifeUpdate] = {
    val s = applyLifeEvents(
      state.getOption.getOrElse(LifeState(0, "", "", closed = false)), events.toSeq)
    state.update(s)
    Iterator.single(LifeUpdate(attackId, if (s.closed) 0 else 1,
      s.startDate, s.endDate, s.nStarts))
  }

  /** TTL-bounded lifecycle: same transitions, but each update arms an
    * event-time timeout `ttlMs` past the attack's latest event, and the
    * timeout callback drops the state. This is what makes the job runnable
    * over 10^12 turns: state is bounded by the set of attacks ACTIVE within
    * the TTL horizon, not by stream history. A stop arriving after its
    * attack's eviction is a log-only no-op (nStarts reads 0 — an orphan),
    * which is the correct degradation: the reference's guard makes orphan
    * stops no-ops anyway, so only episodes longer than the TTL can resolve
    * differently — pick the TTL above the longest plausible episode.
    */
  def lifecycleFnTtl(ttlMs: Long)(attackId: Long, events: Iterator[LifeEvent],
                                  state: GroupState[LifeState]): Iterator[LifeUpdate] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val evs = events.toSeq
      val s = applyLifeEvents(
        state.getOption.getOrElse(LifeState(0, "", "", closed = false)), evs)
      state.update(s)
      // clamped to watermark+1: a batch of purely LATE events (all ts+ttl
      // <= current watermark) would otherwise make setTimeoutTimestamp
      // throw (Spark requires the timeout to exceed the watermark) and
      // crash the query — flatMapGroupsWithState does NOT pre-filter late
      // rows. The clamp arms the earliest legal timeout instead: the
      // already-expired state evicts on the next trigger.
      state.setTimeoutTimestamp(math.max(evs.map(_.ts.getTime).max + ttlMs,
        state.getCurrentWatermarkMs + 1))
      Iterator.single(LifeUpdate(attackId, if (s.closed) 0 else 1,
        s.startDate, s.endDate, s.nStarts))
    }
  }

  /** Keyed lifecycle over the exploded record stream (starts + `_stop`s).
    * `stateTtlMs` switches to the TTL-bounded state machine (event-time
    * timeout keyed to the watermark).
    */
  def lifecycle(spark: SparkSession, exploded: DataFrame,
                stateTtlMs: Option[Long] = None): Dataset[LifeUpdate] = {
    import spark.implicits._
    val events = exploded
      .filter(col("record_type").isin("attacks", "_stop") && col("attack_id") =!= 0L)
      .select(col("attack_id"),
        (col("record_type") === "_stop").as("is_stop"),
        coalesce(
          when(col("record_type") === "_stop", col("device_utc_time"))
            .otherwise(col("attack_start_date")), lit("")).as("event_utc"),
        col("ts"))
      .as[LifeEvent]
    stateTtlMs match {
      case Some(ttl) =>
        events.withWatermark("ts", "0 seconds")
          .groupByKey(_.attack_id)
          .flatMapGroupsWithState(OutputMode.Update(),
            GroupStateTimeout.EventTimeTimeout())(lifecycleFnTtl(ttl))
      case None =>
        events.groupByKey(_.attack_id)
          .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(lifecycleFn)
    }
  }

  // ---- streaming sessionization (parity with ConversationOps.sessionize) ----

  case class SessTurn(conv_id: String, turn_idx: Int, ts: java.sql.Timestamp)
  case class SessState(lastUs: Long, idx: Int, startUs: Long)
  case class SessAssign(conv_id: String, turn_idx: Int, session_idx: Int,
                        session_start_us: Long)

  /** Keyed gap-based sessionization: per-conversation state holds only
    * (last event-time, session counter, session start) — 20 bytes — and a
    * turn starts a new session exactly when its gap to the previous turn
    * exceeds `gapSec` (same rule as the batch window variant; parity pinned
    * in StreamingSpec). Within a micro-batch turns sort by turn_idx; across
    * batches the state carries continuity. `session_start_us` is the
    * EVICTION-STABLE session key: a production deployment bounds state with
    * an event-time TTL ≥ the gap (any post-eviction turn provably starts a
    * new session, so only the dense per-conv counter would be lost, never
    * the session identity).
    */
  def sessionizeFn(gapUs: Long)(convId: String, turns: Iterator[SessTurn],
                                state: GroupState[SessState]): Iterator[SessAssign] = {
    var s = state.getOption.getOrElse(SessState(Long.MinValue, 0, 0L))
    val out = turns.toSeq.sortBy(_.turn_idx).map { t =>
      val us = t.ts.getTime * 1000L + (t.ts.getNanos / 1000) % 1000
      if (s.lastUs == Long.MinValue || us - s.lastUs > gapUs)
        s = SessState(us, s.idx + 1, us)
      else s = s.copy(lastUs = us)
      SessAssign(convId, t.turn_idx, s.idx, s.startUs)
    }
    state.update(s)
    out.iterator
  }

  /** TTL-bounded sessionization: same transitions, but the state arms an
    * event-time timeout `ttlMs` past the conversation's latest turn and
    * evicts on expiry — per-conversation state is bounded by the set of
    * conversations ACTIVE within the TTL horizon, not by stream history
    * (the property that makes this runnable over 10^12 turns). Pick
    * `ttlMs` >= the session gap: any turn arriving after its
    * conversation's eviction is, by construction, more than a gap past the
    * previous turn, so it provably starts a NEW session and only the dense
    * per-conv counter restarts — `session_start_us` (the eviction-stable
    * key) is identical to the unbounded run's. Timeout clamped to
    * watermark+1 for purely-late batches, same as lifecycleFnTtl.
    */
  def sessionizeFnTtl(gapUs: Long, ttlMs: Long)(
      convId: String, turns: Iterator[SessTurn],
      state: GroupState[SessState]): Iterator[SessAssign] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val ts = turns.toSeq
      val out = sessionizeFn(gapUs)(convId, ts.iterator, state)
      state.setTimeoutTimestamp(math.max(ts.map(_.ts.getTime).max + ttlMs,
        state.getCurrentWatermarkMs + 1))
      out
    }
  }

  def sessionizeStream(spark: SparkSession, transcripts: DataFrame,
                       gapSec: Long = 3600,
                       stateTtlMs: Option[Long] = None): Dataset[SessAssign] = {
    import spark.implicits._
    val turns = transcripts
      .select(col("conv_id"), col("turn_idx"), col("ts").cast("timestamp").as("ts"))
      .as[SessTurn]
    stateTtlMs match {
      case Some(ttl) =>
        turns.withWatermark("ts", "0 seconds")
          .groupByKey(_.conv_id)
          .flatMapGroupsWithState(OutputMode.Update(),
            GroupStateTimeout.EventTimeTimeout())(
            sessionizeFnTtl(gapSec * 1000000L, ttl))
      case None =>
        turns.groupByKey(_.conv_id)
          .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
            sessionizeFn(gapSec * 1000000L))
    }
  }

  /** Streaming exact dedup: drop re-delivered rows by content digest within
    * the watermark horizon — the streaming analog of DedupOps.exactDups for
    * an at-least-once upstream (the socket/file ingest redelivers on
    * reconnect). Keyed state holds only the 16-byte digest and ages out at
    * the watermark, which is what makes this runnable indefinitely: state
    * is bounded by the redelivery window, not by stream history. Rows
    * never shuffle wider than (digest, payload) once, keyed on the digest.
    */
  def dedupStream(transcripts: DataFrame, watermark: String = "10 minutes"): DataFrame =
    transcripts
      .withColumn("_digest", md5(col("text").cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("_digest")
      .drop("_digest")

  /** Idempotent per-batch sink write: each micro-batch lands in its own
    * `batch_id=<id>` partition directory with mode=overwrite, so a batch
    * REPLAYED after a sink-side crash (checkpoint committed the offsets but
    * the write half-finished, or vice versa) rewrites the same directory
    * instead of appending duplicates. Checkpoint replay + idempotent write
    * = exactly-once sink contents; a blind mode(append) under the same
    * checkpoint is only at-least-once. Reference contrast:
    * bbn_f5networks.rb:120-139 retries with data loss and no replay
    * protection at all — this hardening is the north rule's resume
    * contract, not reference parity.
    */
  def writeBatch(outRoot: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").partitionBy("record_type")
      .parquet(s"$outRoot/batch_id=$batchId")

  /** Narrow W3 lifecycle facts of one micro-batch — same extraction as
    * Router.route's phase-2 staged read-back (Pipeline.lifeFactsFromStaged),
    * applied to the in-flight batch before its `_stop` rows are dropped.
    */
  def batchLifeFacts(batch: DataFrame): DataFrame =
    batch.filter(col("record_type").isin(Pipeline.Attacks, Pipeline.Stop) &&
        col("attack_id") =!= 0L)
      .select(col("attack_id"), (col("record_type") === Pipeline.Attacks).as("is_atk"),
        col("ts"), col("device_utc_time"))

  /** Bucket count for the attack-keyed streamed sidecars. At 100 TB this is
    * sized so one bucket's attacks fit a target file size (Iceberg would
    * make it the table's bucket transform); here it only needs to exceed
    * the typical per-batch touched-attack spread so a micro-batch rewrites
    * a strict subset of the resolved sink.
    */
  val DefaultAttackBuckets = 16

  /** True iff `path` contains at least one parquet data file — the guard
    * that keeps schema inference from throwing on a sink directory whose
    * batches were all empty (e.g. only `_stop` rows routed so far).
    */
  private def hasParquet(path: String): Boolean = {
    val root = java.nio.file.Paths.get(path)
    java.nio.file.Files.exists(root) && {
      val walk = java.nio.file.Files.walk(root)
      // skip underscore-prefixed subtrees, mirroring Spark's hidden-path
      // rule: a data file inside `_attacks`/`_resolved` must not make the
      // MAIN `outRoot` read look non-empty
      try walk.anyMatch { f =>
        f.getFileName.toString.endsWith(".parquet") && {
          val rel = root.relativize(f)
          (0 until rel.getNameCount - 1)
            .forall(i => !rel.getName(i).toString.startsWith("_"))
        }
      }
      finally walk.close()
    }
  }

  /** The INCREMENTAL resolve frame: attacks and accumulated lifecycle facts
    * restricted (by PARTITION FILTER on their bucket dirs — plan-pinned in
    * PlanShapeSpec) to the buckets a micro-batch touched, joined through the
    * same narrow lifecycle aggregate as the batch MERGE. Exposed separately
    * from the write so specs can pin the pruned plan shape.
    */
  def incrementalResolveFrame(spark: SparkSession, outRoot: String,
                              touched: Seq[Int], buckets: Int): DataFrame = {
    val facts = spark.read.parquet(s"$outRoot/_lifefacts")
      .filter(col("fbucket").isin(touched: _*))
      .select("attack_id", "is_atk", "ts", "device_utc_time")
    val attacks = spark.read.parquet(s"$outRoot/_attacks")
      .filter(col("abucket").isin(touched: _*))
      .withColumnRenamed("abucket", "rbucket")
      .drop("batch_id")
    Pipeline.applyLifecycleToAttacks(attacks, Pipeline.lifeAggOf(facts))
  }

  /** The streamed MERGE, incremental: rewrite ONLY the resolved-sink buckets
    * whose attacks this micro-batch routed or whose lifecycle facts it
    * appended. Reference behavior: each stop event synchronously re-updated
    * the stored attack document in ES (bbn_syslog.rb:271-324); here a
    * micro-batch of stops updates the affected attack buckets in one narrow
    * agg + join + dynamic-partition overwrite.
    *
    * Scale shape: per-batch work is O(touched-buckets/B of the sink), not
    * O(total attacks so far) — the full-sink rewrite was O(B^2) over a
    * stream's life. Reads prune to the touched buckets at the source
    * (PartitionFilters on abucket/fbucket), and the write replaces only the
    * touched `rbucket=` partitions (partitionOverwriteMode=dynamic — the
    * parquet stand-in for an Iceberg MERGE INTO touching only affected
    * files). Idempotent: a replayed batch overwrites its own batch-id dirs
    * first, so the accumulated state it resolves from is unchanged and the
    * touched buckets rewrite to identical contents.
    */
  def resolveAttacks(spark: SparkSession, outRoot: String,
                     touched: Seq[Int], buckets: Int = DefaultAttackBuckets): Unit = {
    if (touched.isEmpty || !hasParquet(s"$outRoot/_attacks")) return
    if (!hasParquet(s"$outRoot/_lifefacts")) return
    incrementalResolveFrame(spark, outRoot, touched, buckets)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("rbucket")
      .parquet(s"$outRoot/_resolved/record_type=attacks")
  }

  /** The routed-sink batch writer (the streaming analog of Router.route):
    * 1. the batch's stats/traffic rows land in their own `batch_id=<id>`
    *    directory partitioned by record_type (idempotent overwrite — see
    *    writeBatch for the exactly-once contract);
    * 2. the batch's attacks rows land under `_attacks/batch_id=<id>`
    *    partitioned by `abucket = pmod(attack_id, buckets)`, and its narrow
    *    lifecycle facts under `_lifefacts/batch_id=<id>` partitioned by
    *    `fbucket` — same batch-id-keyed idempotence; the underscore prefix
    *    keeps all sidecars invisible to partition discovery over `outRoot`;
    * 3. resolveAttacks rewrites ONLY the touched resolved buckets so the
    *    routed output CONVERGES to the batch Router.route result as the
    *    stream drains — a stop in batch N closes an attack routed in batch
    *    N-k, exactly as the reference's ES update side-channel did.
    */
  def writeRoutedBatch(outRoot: String, buckets: Int = DefaultAttackBuckets)(
      batch: DataFrame, batchId: Long): Unit = {
    val b = batch.persist()
    try {
      b.filter(!col("record_type").isin(Pipeline.Stop, Pipeline.Attacks))
        .write.mode("overwrite").partitionBy("record_type")
        .parquet(s"$outRoot/batch_id=$batchId")
      b.filter(col("record_type") === Pipeline.Attacks)
        .drop("record_type")
        .withColumn("abucket", pmod(col("attack_id"), lit(buckets)).cast("int"))
        .write.mode("overwrite").partitionBy("abucket")
        .parquet(s"$outRoot/_attacks/batch_id=$batchId")
      batchLifeFacts(b)
        .withColumn("fbucket", pmod(col("attack_id"), lit(buckets)).cast("int"))
        .write.mode("overwrite").partitionBy("fbucket")
        .parquet(s"$outRoot/_lifefacts/batch_id=$batchId")
      // the touched-bucket set: a scalar probe over the batch (<= `buckets`
      // distinct ints on the driver, the Lineage.commitPartition pattern)
      val touched = b
        .filter(col("record_type") === Pipeline.Attacks ||
          (col("record_type") === Pipeline.Stop && col("attack_id") =!= 0L))
        .select(pmod(col("attack_id"), lit(buckets)).cast("int").as("bk"))
        .distinct().collect().map(_.getInt(0)).toSeq
      resolveAttacks(b.sparkSession, outRoot, touched, buckets)
    } finally b.unpersist()
  }

  /** Routed streamed sinks -> one DataFrame: the resolved attacks (post
    * incremental lifecycle MERGE) plus every other family from the batch-id
    * sinks — the frame a StreamingSpec equates with Router.readRouted.
    * Either side may be absent (an attacks-only or stats-only stream);
    * schema inference is guarded so empty batches can't crash the read.
    */
  def readRoutedStream(spark: SparkSession, outRoot: String): DataFrame = {
    val resolvedPath = s"$outRoot/_resolved/record_type=attacks"
    val rest =
      if (hasParquet(outRoot)) Some(spark.read.parquet(outRoot)
        .filter(col("record_type") =!= Pipeline.Attacks)
        .drop("batch_id"))
      else None
    val resolved =
      if (hasParquet(resolvedPath)) Some(spark.read.parquet(resolvedPath)
        .drop("rbucket")
        .withColumn("record_type", lit(Pipeline.Attacks)))
      else None
    (rest, resolved) match {
      case (Some(r), Some(a)) => r.unionByName(a, allowMissingColumns = true)
      case (Some(r), None)    => r
      case (None, Some(a))    => a
      case (None, None) =>
        throw new IllegalStateException(s"no routed parquet data under $outRoot")
    }
  }

  /** End-to-end streaming job: parse -> route to per-record_type parquet
    * sinks via foreachBatch (the streaming analog of the S5 fan-out), with
    * checkpointing + batchId-keyed idempotent writes for exactly-once sink
    * contents, and the W3 lifecycle applied per micro-batch so the attacks
    * sink converges to the batch Router.route output (see writeRoutedBatch).
    */
  def routeStream(spark: SparkSession, sourcePath: String, outRoot: String,
                  checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val records = streamRecordsAll(spark, streamTranscripts(spark, sourcePath))
    records.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(writeRoutedBatch(outRoot) _)
      .start()
  }
}
