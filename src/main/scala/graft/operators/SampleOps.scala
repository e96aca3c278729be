package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for the training-data pipeline.
  *
  * Membership is a PURE FUNCTION of the row (hash bucket vs a per-stratum
  * rate), never RNG state: a re-run, a speculative task, or a resumed job
  * emits the identical sample — the property that makes sampling usable in
  * a resumable 100 TB pipeline (rand()-based sampling changes membership
  * on every retry and breaks lineage manifests).
  *
  * The plan is narrow: one map to compute the bucket, one broadcast join
  * against the (tiny) rates dim, one filter. No shuffle of the corpus.
  */
object SampleOps {

  /** Buckets per stratum; rates are expressed in permille. */
  val SampleBuckets = 1000L

  /** Engine-portable bucket: Knuth multiplicative mix mod 1000. The
    * multiplier is odd and coprime to 1000, so consecutive ids spread over
    * all buckets uniformly. The id is reduced mod 1000 BEFORE the multiply
    * — identical value for every id ((a*b) mod m == ((a mod m)*b) mod m)
    * but the product is bounded by 999 * 2654435761 < 2^63, so the bucket
    * is total over the full int64 id domain (the raw product wraps silently
    * in Spark and errors under ANSI/DuckDB past ~3.47e9).
    */
  def sampleBucket(id: Column): Column =
    pmod(pmod(id, lit(SampleBuckets)) * lit(2654435761L), lit(SampleBuckets))

  /** Default per-language rates: downsample the dominant language, keep
    * more of the tail — the usual corpus-balancing shape.
    */
  def defaultRates(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("en", 350L), ("zh", 700L), ("es", 700L), ("de", 700L), ("fr", 700L))
      .toDF("lang", "rate_permille")
  }

  /** Per-stratum deterministic downsample: keep a doc iff its bucket falls
    * under its stratum's rate. Strata with no rate row are dropped
    * entirely (inner join) — the explicit-allowlist behavior a curated
    * training mix wants.
    */
  def stratifiedSample(docs: DataFrame, rates: DataFrame): DataFrame =
    docs
      .withColumn("sample_bucket", sampleBucket(col("doc_id")))
      .join(broadcast(rates), Seq("lang"))
      .filter(col("sample_bucket") < col("rate_permille"))
      .select(col("doc_id"), col("lang"), col("sample_bucket"))

  /** Sequence packing for training data loaders: assign documents to packs
    * of ~`budget` tokens via a running prefix sum, per `source` shard.
    * `pack_id = exclusive_prefix_tokens div budget` — the streaming-fill
    * variant every loader uses at scale: a pack can exceed the budget by
    * less than one document (bounded overflow), but assignment is a pure
    * prefix-sum function, so it parallelizes as one window per shard and is
    * retry/resume-deterministic. (Exact greedy reset-on-overflow packing is
    * inherently sequential per shard — it cannot be expressed as a prefix
    * function — and buys only tighter packing, not correctness.)
    *
    * The window partitions by `source`, so the skew ceiling is the largest
    * single shard, same note as the per-conversation windows; a shard-less
    * corpus would first be bucketed into synthetic shards by hash.
    */
  /** Long-document chunking for pretraining loaders: split each document
    * into windows of at most `maxTokens` tokens with `overlap` tokens of
    * context carried between consecutive chunks (stride = max - overlap),
    * the standard complement of packSequences (packing joins SHORT docs,
    * chunking splits LONG ones; a loader applies both). Pure per-row
    * compute: one explode bounded by ceil(n/stride) per doc, no shuffle —
    * at 100 TB this is a map-only pass. Chunk count uses integer ceiling
    * arithmetic ((n - overlap + stride - 1) div stride) so the DuckDB
    * oracle reproduces the split exactly; a document at or under the
    * window emits itself as its only chunk.
    */
  def chunkDocuments(docs: DataFrame, maxTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens)
    val stride = maxTokens - overlap
    val toks = TextOps.tokens(col("text"))
    val n = size(toks).cast("long")
    val nChunks = when(n <= maxTokens, lit(1L))
      .otherwise(expr(s"(size(split(text, ' ')) - $overlap + ${stride - 1}) div $stride"))
    docs
      .select(col("doc_id"), col("text"), nChunks.as("n_chunks"))
      .select(col("doc_id"), col("text"), col("n_chunks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("n_chunks").cast("int").as("n_chunks"),
        array_join(slice(TextOps.tokens(col("text")),
          (col("chunk_idx") * stride + 1).cast("int"), lit(maxTokens)), " ").as("chunk_text"))
      .withColumn("n_chunk_tokens", size(TextOps.tokens(col("chunk_text"))))
  }

  /** Default per-source token budgets for the mix: a deterministic
    * up/down-weighting over the corpus's 20 ingestion sources.
    */
  def defaultBudgets(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 20).map(i => (s"src$i", 1000L + (i % 5) * 1000L))
      .toDF("source", "token_budget")
  }

  /** Source-weighted token-budget MIX — the pretraining data-mixing step:
    * given per-source token budgets (the tiny dim above, broadcast),
    * select each source's deterministic pseudo-shuffled PREFIX of
    * documents whose exclusive cumulative token count stays under the
    * budget, so every source contributes its budgeted share of tokens to
    * the mix. Selection is a pure prefix predicate over a stable order
    * (multiplicative mix of doc_id, ties on doc_id) — no RNG, so retries,
    * speculative tasks and resumed runs emit the identical mix; the mix
    * key pseudo-shuffles ids so the prefix is an unbiased sample, not the
    * oldest docs (new corpus ids hash into arbitrary prefix positions, so
    * regrowing the corpus re-draws the mix — pin the snapshot id when the
    * mix must be frozen). Bounded overflow as in packSequences: the last
    * kept doc may overshoot by < 1 document.
    *
    * Scale shape: one map (token count + mix key), one per-source window
    * prefix sum (skew ceiling = largest source, the q42 note; the
    * two-level variant — per-partition partial sums + broadcast offsets —
    * drops in when one source dominates), one broadcast join + filter.
    * Text never shuffles; only (id, source, n_tokens) does.
    */
  def mixByTokenBudget(docs: DataFrame, budgets: DataFrame): DataFrame = {
    val w = Window.partitionBy("source").orderBy("_mix_key", "doc_id")
    val nTok = size(TextOps.tokens(col("text"))).cast("long")
    // id reduced mod 999983 BEFORE the multiply: same key for every id
    // (modular identity), but the product stays under 2^63 for the whole
    // int64 domain — the raw doc_id * 2654435761 form wraps silently past
    // ~3.47e9 (and errors under ANSI/DuckDB), diverging from the oracle
    docs.select(col("doc_id"), col("source"), nTok.as("n_tokens"),
        pmod(pmod(col("doc_id"), lit(999983L)) * lit(2654435761L), lit(999983L)).as("_mix_key"))
      .withColumn("_prev_cum", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .join(broadcast(budgets), Seq("source"))
      .filter(col("_prev_cum") < col("token_budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("_prev_cum").as("prefix_tokens"))
  }

  /** The TWO-LEVEL prefix-sum mix — the scale path when one source
    * dominates the corpus and mixByTokenBudget's per-source window becomes
    * a single-reducer sort of that source. Bit-identical output (q58's
    * oracle is q54's), different plan:
    *
    *   1. each row is assigned an ORDERED chunk: equal-width ranges of the
    *      mix key (`_chunk = _mix_key div ceil(999983/chunks)`). Chunk id
    *      grows with the key, so (chunk, key, doc_id) order == global
    *      (key, doc_id) order, deterministically and without a sampling
    *      pass — and mix keys are uniform by construction, so chunks are
    *      balanced (the property a raw doc_id range could not give);
    *   2. the heavy window partitions by (source, chunk): the skew ceiling
    *      drops from "largest source" to "largest source / chunks";
    *   3. per-(source, chunk) token totals — an S x chunks aggregate, tiny
    *      — get exclusive chunk offsets from a window over that AGGREGATE
    *      and broadcast back; prev_cum = local prefix + chunk offset.
    *
    * packSequences admits the identical drop-in (same window shape).
    */
  def mixByTokenBudgetTwoLevel(docs: DataFrame, budgets: DataFrame,
                               chunks: Int = 32): DataFrame = {
    val chunkWidth = (999983L + chunks - 1) / chunks
    val nTok = size(TextOps.tokens(col("text"))).cast("long")
    val keyed = docs.select(col("doc_id"), col("source"), nTok.as("n_tokens"),
        pmod(pmod(col("doc_id"), lit(999983L)) * lit(2654435761L), lit(999983L)).as("_mix_key"))
      .withColumn("_chunk", (col("_mix_key") / lit(chunkWidth)).cast("int"))
    val wLocal = Window.partitionBy("source", "_chunk").orderBy("_mix_key", "doc_id")
    val local = keyed.withColumn("_local_cum", sum(col("n_tokens")).over(wLocal))
    val wOff = Window.partitionBy("source").orderBy("_chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("source", "_chunk")
      .agg(sum(col("n_tokens")).as("_chunk_tok"))
      .withColumn("_offset", coalesce(sum(col("_chunk_tok")).over(wOff), lit(0L)))
      .select("source", "_chunk", "_offset")
    local.join(broadcast(offsets), Seq("source", "_chunk"))
      .withColumn("_prev_cum", col("_local_cum") - col("n_tokens") + col("_offset"))
      .join(broadcast(budgets), Seq("source"))
      .filter(col("_prev_cum") < col("token_budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("_prev_cum").as("prefix_tokens"))
  }

  /** TEMPERATURE-scaled source mixing (alpha = 0.5): derive each source's
    * token budget from the corpus itself as
    * `budget_s = floor(total * w_s / sum(w))` with `w_s = isqrt(tokens_s)`
    * — the standard alpha-sampling rebalance (dominant sources are
    * downweighted toward sqrt of their share, tail sources upweighted),
    * then take each source's deterministic pseudo-shuffled prefix exactly
    * as mixByTokenBudget does.
    *
    * The weights are INTEGER square roots, deliberately: sqrt of a bigint
    * is correctly rounded IEEE in both engines, its floor is exact, and
    * from there the normalizer sum, the scaling and the division are pure
    * integer arithmetic — order-independent and bit-equal cross-engine,
    * where a float-weight normalizer would hang the oracle on the
    * engines' float-summation association order. The quantization error
    * vs true sqrt is < 1 part in isqrt(tokens_s) — noise at corpus scale.
    *
    * Scale shape: ONE narrow (id, source, tokens, key) projection feeds
    * both the S-row budget aggregate (broadcast back) and the prefix
    * window — text is scanned once and never shuffles; everything after
    * the projection is the q54 plan plus one tiny agg.
    */
  def mixByTemperature(docs: DataFrame, totalBudget: Long = 20000L): DataFrame = {
    val w = Window.partitionBy("source").orderBy("_mix_key", "doc_id")
    val nTok = size(TextOps.tokens(col("text"))).cast("long")
    val keyed = docs.select(col("doc_id"), col("source"), nTok.as("n_tokens"),
      pmod(pmod(col("doc_id"), lit(999983L)) * lit(2654435761L), lit(999983L)).as("_mix_key"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val budgets = keyed.groupBy("source").agg(sum(col("n_tokens")).as("_src_tok"))
      .withColumn("_wgt", floor(sqrt(col("_src_tok").cast("double"))).cast("long"))
      .withColumn("_tot", sum(col("_wgt")).over(wAll))
      .withColumn("token_budget", expr(s"($totalBudget * _wgt) div _tot"))
      .select(col("source"), col("token_budget"))
    keyed
      .withColumn("_prev_cum", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .join(broadcast(budgets), Seq("source"))
      .filter(col("_prev_cum") < col("token_budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("_prev_cum").as("prefix_tokens"), col("token_budget"))
  }

  /** Curriculum ordering: a GLOBAL rank over (quality score desc, doc_id)
    * plus a phase bucket (equal-population quantiles of the rank), i.e.
    * "feed the model the cleanest shard first". The point is HOW the rank
    * is built: not `row_number() OVER (ORDER BY ...)` — an unpartitioned
    * rank window funnels the corpus through ONE task — but the two-level
    * decomposition the q54/q58 mixes use:
    *
    *   1. a per-score histogram (narrow agg, one row per distinct integer
    *      score — bounded by the score range, not the corpus),
    *   2. exclusive prefix offsets over that HISTOGRAM (the only
    *      unpartitioned window, score-range-sized, the same tiny-side
    *      contract as q58's chunk offsets),
    *   3. a per-score rank window (partitioned by score; skew ceiling =
    *      the largest tie group) plus the broadcast offset.
    *
    * global_rank is IDENTICAL to the naive single-task rank (the oracle
    * computes it that way); phase = ((rank-1) * phases) div total via
    * integral `div` (the q42 floor-division portability rule).
    */
  def curriculumOrder(docs: DataFrame, phases: Int = 4): DataFrame = {
    // persisted for two reasons: (a) three consumers (histogram, total,
    // probe) = one text pass instead of three; (b) the InMemoryRelation is
    // a pushdown BARRIER — without it the join-inferred isnotnull(qm_score)
    // substitutes through the alias and lands the whole quality expression
    // in a Filter below the repartition, i.e. on the single input split
    // (the 138s-vs-1.5s lesson from shingleIndex)
    val scored = Intermediates.persist(
      TextOps.qualityModelScore(docs).select("doc_id", "qm_score"))
    val hist = scored.groupBy("qm_score").agg(count(lit(1)).as("_n"))
    val offsets = hist
      .withColumn("_off",
        sum(col("_n")).over(Window.orderBy(col("qm_score").desc)) - col("_n"))
      .select("qm_score", "_off")
    val stats = scored.agg(count(lit(1)).as("_total"))
    scored.join(broadcast(offsets), Seq("qm_score"))
      .crossJoin(broadcast(stats))
      .withColumn("global_rank",
        (col("_off") + row_number().over(
          Window.partitionBy("qm_score").orderBy("doc_id"))).cast("long"))
      .select(col("doc_id"), col("qm_score"), col("global_rank"),
        expr(s"((global_rank - 1) * ${phases}L) div _total").cast("long")
          .as("phase"))
  }

  /** LEAKAGE-FREE train/val/test split: the split key is a deterministic
    * hash of the document's near-dup CLUSTER keeper (q32's connected
    * components), not of the document — so a template, its rephrasings,
    * and everything transitively chained to them land in the SAME split.
    * Hashing doc_ids directly is the classic eval-leakage bug: a val doc's
    * near-duplicate sits in train and the eval measures memorization.
    * Same permille-bucket arithmetic as [[stratifiedSample]] (pure
    * function of the keeper id: re-runs, retries and corpus appends that
    * do not touch a cluster keep its split).
    *
    * Scale shape: cluster resolution is the already-audited star
    * contraction ((long, long) labels only); the split assignment is one
    * map over the label table. Text is never touched after shingling.
    */
  def clusterSplit(docs: DataFrame, valPermille: Int = 100,
                   testPermille: Int = 100): DataFrame = {
    val bucket = pmod(pmod(col("cluster_id"), lit(999983L)) * lit(2654435761L),
      lit(SampleBuckets))
    DedupOps.dupClusters(docs)
      .withColumn("_b", bucket)
      .select(col("doc_id"), col("cluster_id"),
        when(col("_b") < testPermille, lit("test"))
          .when(col("_b") < testPermille + valPermille, lit("val"))
          .otherwise(lit("train")).as("split"))
  }

  /** The composed CURATION PIPELINE — the capstone query: every document
    * routed through the canonical pretraining curation sequence
    *
    *   exact dedup (q20 keepers) -> quality model (q67) ->
    *   benchmark decontamination (q39) -> token-budget mix (q54)
    *
    * with per-stage attribution: each non-benchmark document gets its
    * stage verdicts plus a single `verdict` string naming the FIRST stage
    * that dropped it (or `selected` / `over_budget` for survivors). This
    * is the end-to-end evidence the individually-verified operators
    * compose: the oracle recomputes the whole chain independently and the
    * row set must match bit-for-bit, including the subtle interactions —
    * a document whose exact-dup keeper is a BENCHMARK doc is dropped as a
    * dup (keepers are computed over the full corpus before the bench
    * exclusion), and the mix window runs over SURVIVORS only, so its
    * prefix sums differ from q54's corpus-wide ones.
    *
    * Scale shape: each stage is the already-audited operator unchanged; a
    * production run materializes stage outputs to the staged store
    * (Router-style) rather than recomputing the text scans per stage —
    * the composition here is the semantic contract, not the IO plan.
    */
  def curationPipeline(docs: DataFrame): DataFrame = {
    val dups = DedupOps.exactDups(docs).select(col("doc_id"),
      (col("doc_id") === col("keeper_doc_id")).as("_keeper"))
    val qm = TextOps.qualityModelScore(docs)
      .select(col("doc_id"), col("keep").as("_qkeep"))
    // inner join against the decontamination verdicts drops benchmark
    // docs from the report entirely (they are not training candidates)
    val dec = DedupOps.decontaminate(docs)
      .select(col("doc_id"), col("is_contaminated"))
    val flags = docs.select(col("doc_id"), col("source"), col("text"))
      .join(dups, Seq("doc_id")).join(qm, Seq("doc_id")).join(dec, Seq("doc_id"))
    val survivors = flags
      .filter(col("_keeper") && col("_qkeep") && !col("is_contaminated"))
      .select("doc_id", "source", "text")
    val selected = mixByTokenBudget(survivors, defaultBudgets(docs.sparkSession))
      .select(col("doc_id"), lit(true).as("_sel"))
    flags.join(selected, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        col("_keeper").as("dedup_keeper"),
        col("_qkeep").as("quality_keep"),
        (!col("is_contaminated")).as("decontam_keep"),
        coalesce(col("_sel"), lit(false)).as("selected"),
        when(!col("_keeper"), lit("exact_dup"))
          .when(!col("_qkeep"), lit("quality"))
          .when(col("is_contaminated"), lit("contaminated"))
          .when(coalesce(col("_sel"), lit(false)), lit("selected"))
          .otherwise(lit("over_budget")).as("verdict"))
  }

  /** Packing-efficiency telemetry over [[packSequences]]: per source, how
    * many packs the shard fills, the total/max tokens per pack and the
    * mean fill fraction against the budget — the utilization sheet that
    * decides whether the packing budget is sized right for a shard (under-
    * filled packs waste accelerator batch slots 1:1). Composes the q42
    * assignment unchanged; two narrow aggregates on top ((source, pack_id)
    * then source), one exact-long division for the fill fraction.
    */
  def packEfficiency(docs: DataFrame, budget: Int = 256): DataFrame =
    packSequences(docs, budget)
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tok"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_packs"),
        sum("tok").as("total_tokens"),
        max("tok").as("max_pack_tokens"),
        (sum("tok").cast("double")
          / (count(lit(1)) * lit(budget.toLong)).cast("double")).as("mean_fill"))

  def packSequences(docs: DataFrame, budget: Int = 256): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    val nTok = size(TextOps.tokens(col("text"))).cast("long")
    docs.select(col("doc_id"), col("source"), nTok.as("n_tokens"))
      .withColumn("_prev_cum", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integral `div`, not `/`: Spark's `/` on longs is double division,
      // which matches the oracle's `//` floor only while the quotient is
      // exactly representable — `div` matches it for every budget
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"_prev_cum div ${budget.toLong}").cast("long").as("pack_id"))
  }
}
