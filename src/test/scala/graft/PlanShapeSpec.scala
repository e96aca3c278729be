package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.CreateArray
import org.apache.spark.sql.catalyst.plans.logical.Generate
import graft.operators.Pipeline

/** Plan-shape pins for the parse pipeline: the scan count and the explode
  * branch count are the two levers behind the r2->r3 4-30x query speedups
  * (family pruning + narrow lifecycle facts), so regressions must fail a
  * spec, not wait for a bench run.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Number of parquet scans in the physical plan (the transcripts store is
    * the only parquet input on these paths; dims are local relations).
    */
  private def nParquetScans(df: DataFrame): Int =
    "Scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).size

  /** Branch-array sizes of every E1 explode in the optimized plan. */
  private def explodeBranchCounts(df: DataFrame): Seq[Int] =
    df.queryExecution.optimizedPlan.collect {
      case g: Generate =>
        g.generator.collectFirst { case c: CreateArray => c.children.size }
    }.flatten

  test("q15 rollup: ONE transcript scan feeds both rollup sides (no second parse)") {
    val df = Pipeline.attackRollup(spark, dir)
    assert(nParquetScans(df) == 1,
      s"expected a single transcript scan:\n${df.queryExecution.executedPlan.toString.take(3000)}")
    // window aggregates over attacks+stats branches only
    assert(explodeBranchCounts(df) == Seq(4 + 3))
  }

  test("family pruning: single-family consumers render only their own branch structs") {
    // full records(): 8 routed branches (attacks 4, stats 3, traffic 1);
    // lifecycle facts add a second explode of 6 start/stop probes
    assert(explodeBranchCounts(Pipeline.records(spark, dir)).sorted == Seq(6, 8))
    // stats-only: 3 branches, no lifecycle facts scan
    val stats = Pipeline.statsRecords(spark, dir)
    assert(explodeBranchCounts(stats) == Seq(3))
    assert(nParquetScans(stats) == 1)
    // traffic-only: 1 branch, one scan
    val traffic = Pipeline.trafficRecords(spark, dir)
    assert(explodeBranchCounts(traffic) == Seq(1))
    assert(nParquetScans(traffic) == 1)
    // attacks: 4 branches + the 6-probe facts explode, two scans BY DESIGN
    // (the facts re-scan parses three keys instead of re-rendering the
    // 50-column structs — Router.route stages instead and re-reads columns)
    val atk = Pipeline.attacksCorrelated(spark, dir)
    assert(explodeBranchCounts(atk).sorted == Seq(4, 6))
    assert(nParquetScans(atk) == 2)
  }

  test("lifecycle join resolves as broadcast: the wide records never shuffle") {
    // the per-attack lifecycle aggregate is tiny (episodes, not turns) —
    // AQE must land it as a broadcast join; a conf drift that turned this
    // into a SortMergeJoin would shuffle the full-width records (the r2
    // q11 regression class). Execute so the adaptive plan is FINAL.
    val df = Pipeline.attacksCorrelated(spark, dir)
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"lifecycle join is not broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"wide records are being shuffled for a join:\n${plan.take(3000)}")
  }

  test("ivfTopK probe scan is partition-pruned to the probed buckets") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").repartition(4)
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-plan").toString
    graft.operators.SimilarityOps.buildIvfIndex(emb, idxPath)
    val df = graft.operators.SimilarityOps.ivfTopK(spark, idxPath, emb.limit(8))
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    // the index scan must carry a partition filter on the bucket column
    // (static or dynamic pruning) — an unpruned probe reads the whole
    // index per query, the exact failure mode the IVF layout exists to
    // prevent at 100 TB
    val scanLine = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains(idxPath.split('/').last))
      .orElse(plan.linesIterator.find(_.contains("PartitionFilters")))
    assert(scanLine.exists(l => l.contains("dynamicpruning") ||
        """PartitionFilters: \[[^\]]*bucket""".r.findFirstIn(l).isDefined),
      s"no bucket partition filter on the index scan:\n${plan.take(3000)}")
    graft.operators.Router.rmrf(java.nio.file.Paths.get(idxPath))
  }

  test("production transcript ordering: hash exchange + LOCAL sort, no global range sort") {
    val df = Pipeline.transcriptsClustered(spark, dir)
    // one hash exchange on conv_id; NEVER a range exchange (the global-sort
    // shape that samples and range-shuffles the full text corpus)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("hashpartitioning(conv_id"), planStr.take(2000))
    assert(!planStr.toLowerCase.contains("rangepartitioning"), planStr.take(2000))
    // every sort is partition-local (SortExec renders "Sort [...], <global>, 0";
    // string match because the adaptive wrapper hides children from collect)
    assert("""Sort \[[^\]]*\], false, 0""".r.findFirstIn(planStr).isDefined, planStr.take(2000))
    assert("""Sort \[[^\]]*\], true, 0""".r.findFirstIn(planStr).isEmpty, planStr.take(2000))
    // and the contract holds: within every partition (conv_id, turn_idx)
    // is non-decreasing, with each conversation contiguous in one partition
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    val parts = df.select(spark_partition_id().as("p"), col("conv_id"), col("turn_idx"))
      .collect().groupBy(_.getInt(0))
    parts.values.foreach { rows =>
      val keys = rows.map(r => (r.getString(1), r.getInt(2))).toSeq
      assert(keys == keys.sorted, "partition not locally sorted")
    }
    val convToParts = df.select(spark_partition_id().as("p"), col("conv_id"))
      .distinct().collect().groupBy(_.getString(1)).view.mapValues(_.length)
    assert(convToParts.values.forall(_ == 1), "a conversation spans partitions")
  }

  test("incremental streamed resolve prunes both sidecar scans to the touched buckets") {
    import graft.streaming.StreamingPipeline
    val outPath = java.nio.file.Files.createTempDirectory("graft-incr-plan").toString
    val exploded = StreamingPipeline.streamRecordsAll(spark,
      graft.sources.TranscriptStore.table(spark, dir))
    StreamingPipeline.writeRoutedBatch(outPath)(exploded, 0L)
    val df = StreamingPipeline.incrementalResolveFrame(spark, outPath, Seq(1, 2), 16)
    val plan = df.queryExecution.executedPlan.toString
    // the attacks and facts scans must carry PARTITION filters on their
    // bucket dirs — an unpruned resolve re-reads the whole accumulated
    // state per micro-batch, the O(B^2) shape the incremental MERGE removes
    assert("""PartitionFilters: \[[^\]]*abucket""".r.findFirstIn(plan).isDefined,
      s"no abucket partition filter on the attacks scan:\n${plan.take(3000)}")
    assert("""PartitionFilters: \[[^\]]*fbucket""".r.findFirstIn(plan).isDefined,
      s"no fbucket partition filter on the facts scan:\n${plan.take(3000)}")
    graft.operators.Router.rmrf(java.nio.file.Paths.get(outPath))
  }

  test("curriculum rank: the quality expression never reappears under an inferred isnotnull") {
    // without the persist barrier, the offsets join's inferred
    // isnotnull(qm_score) substitutes through the alias and evaluates the
    // WHOLE quality expression in a Filter below the repartition — on the
    // single input split (the shingleIndex 138s lesson). Fixed shape: the
    // only isnotnull is over the cached attribute, so no plan line may
    // carry the trap signature (isnotnull over the raw text expression).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(4)
    val plan = graft.operators.SampleOps.curriculumOrder(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l =>
      l.contains("isnotnull") && l.contains("split(text")),
      s"quality expression pushed under isnotnull:\n${plan.take(3000)}")
    assert(plan.contains("InMemoryTableScan"), "persist barrier missing")
    graft.operators.Intermediates.release(spark)
  }

  test("AQE and its skew-join re-plan are active in the session the pipeline runs under") {
    // cosineDupPairs' hot-bucket fan-out and the lifecycle join rely on
    // runtime re-planning; pin the confs so a builder change can't
    // silently disable them (they are also Spark 4 defaults)
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }
}
