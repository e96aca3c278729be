package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.F5Parse._
import graft.operators.Pipeline
import graft.sources.Transcripts

/** Driver contract — see SURVEY.md §7 + BASELINE.json north rule.
  *
  * Every query runs over the deterministic transcripts synthesis
  * (graft.sources.Transcripts over `events.parquet`) or the driver's
  * documents/embeddings tables; each has an exact DuckDB oracle in
  * graft.Oracle that recomputes the expected output from the generating
  * arithmetic, independent of the Spark-side parsers.
  */
object SparkEntry {

  /** The transcripts table seam: every query reads through the
    * TranscriptTable trait, so an Iceberg-backed implementation swaps in
    * here (and via the `store` parameters on Pipeline/Router/Lineage)
    * without touching any query.
    */
  val store: graft.sources.TranscriptTable = graft.sources.TranscriptStore

  private def transcripts(s: SparkSession, dir: String): DataFrame = {
    Pipeline.configure(s)
    store.table(s, dir)
  }

  /** Flagship: full parse->route->aggregate over sf0.001 transcripts. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.records(spark, "/root/testdata/sf0.001")
      .groupBy("record_type", "remote_log_format")
      .count()

  private def kvv(key: String) = element_at(col("kv"), key)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- pipeline: parse -> enrich -> normalize -> route -> aggregate ----
    // the global orderBy is the DRIVER CONTRACT's deterministic-dump
    // requirement, not a production shape: at 10^12 turns a total order is
    // a presentation concern — the engine would sortWithinPartitions on
    // (conv_id, turn_idx) (per-conversation order is what downstream
    // consumers need; the store already clusters by conv) and let readers
    // merge, never range-exchange the full text corpus
    "q01_transcripts" -> ((s, dir) => transcripts(s, dir).orderBy("conv_id", "turn_idx")),
    "q02_format_counts" -> ((s, dir) =>
      Pipeline.transcriptsClean(s, dir)
        .groupBy(remoteLogFormat(col("text")).as("remote_log_format"))
        .agg(count("*").as("n_turns"))
        .orderBy("remote_log_format")),
    // the PRI integer is hoisted to one column so facility/severity (and
    // the pushed-down not-null filter) derive from ONE regexp evaluation
    // per row instead of three substituted copies; same output expressions
    "q03_pri" -> ((s, dir) =>
      Pipeline.transcriptsClean(s, dir)
        .withColumn("_pri", pri(col("text")))
        .select(col("conv_id"), col("turn_idx"),
          (col("_pri") / lit(8)).cast("int").as("facility"),
          pmod(col("_pri"), lit(8)).as("severity"))
        .filter(col("facility").isNotNull)
        .orderBy("conv_id", "turn_idx")),
    "q04_kv_probe" -> ((s, dir) => {
      val (sy, _) = Pipeline.bases(s, dir)
      sy.select(col("conv_id"), col("turn_idx"),
        kvv("date_time").as("date_time"),
        kvv("dos_attack_event").as("dos_attack_event"),
        kvv("severity").as("severity_kv"),
        kvv("hostname").as("hostname_kv"))
        .orderBy("conv_id", "turn_idx")
    }),
    "q05_attacks" -> ((s, dir) =>
      Pipeline.attacksCorrelated(s, dir).orderBy("conv_id", "turn_idx")),
    "q06_stats" -> ((s, dir) =>
      Pipeline.statsRecords(s, dir).orderBy("conv_id", "turn_idx")),
    // unified family-pruned path: explodedAll(families=traffic) renders
    // ONLY the traffic branch per row (identical plan cost to the old
    // dedicated bases() select, same oracle)
    "q07_traffic" -> ((s, dir) =>
      Pipeline.trafficRecords(s, dir).orderBy("conv_id", "turn_idx")),
    "q08_sink_counts" -> ((s, dir) =>
      Pipeline.records(s, dir)
        .groupBy("record_type", "remote_log_format", "attack_severity")
        .agg(count("*").as("n_rows"))
        .orderBy("record_type", "remote_log_format", "attack_severity")),
    // same single-regexp PRI hoist as q03
    "q09_agg_facility" -> ((s, dir) =>
      Pipeline.transcriptsClean(s, dir)
        .withColumn("_pri", pri(col("text")))
        .select(col("conv_id"),
          (col("_pri") / lit(8)).cast("int").as("facility"),
          pmod(col("_pri"), lit(8)).as("severity"))
        .filter(col("facility").isNotNull)
        .groupBy("facility", "severity")
        .agg(count("*").as("n_turns"), countDistinct(col("conv_id")).as("n_convs"))
        .orderBy("facility", "severity")),
    "q10_enrich" -> ((s, dir) => {
      transcripts(s, dir)
        .join(broadcast(Transcripts.roleDict(s)), Seq("role"))
        .join(broadcast(Transcripts.toolDict(s)), Seq("tool"))
        .groupBy("role_class", "tool_family")
        .agg(count("*").as("n_turns"), countDistinct(col("conv_id")).as("n_convs"))
        .orderBy("role_class", "tool_family")
    }),
    "q11_lifecycle" -> ((s, dir) =>
      Pipeline.attacksCorrelated(s, dir)
        .filter(col("attack_end_date").isNotNull)
        .orderBy("attack_id", "conv_id", "turn_idx")
        .select("attack_id", "attack_status", "attack_ongoing",
          "attack_start_date", "attack_end_date")),
    "q12_rejects" -> ((s, dir) =>
      Pipeline.rejects(s, dir).orderBy("conv_id", "turn_idx")),
    "q13_conv_stats" -> ((s, dir) =>
      operators.ConversationOps
        .conversationStats(transcripts(s, dir))
        .orderBy("conv_id")),
    "q14_turn_deltas" -> ((s, dir) =>
      operators.ConversationOps
        .turnDeltas(transcripts(s, dir))
        .orderBy("conv_id", "turn_idx")),
    // downstream analytics over the routed families: rollup (attacks x
    // their mitigation-stat samples, per attack_id) in ONE transcript scan
    "q15_attack_rollup" -> ((s, dir) =>
      Pipeline.attackRollup(s, dir).orderBy("attack_id", "attack_name")),

    // ---- training-data ops: dedup / text analysis / ANN / multimodal ----
    "q20_dedup_exact" -> ((s, dir) =>
      operators.DedupOps.exactDups(docs(s, dir)).orderBy("doc_id")),
    "q21_token_stats" -> ((s, dir) =>
      operators.TextOps.tokenStats(docs(s, dir)).orderBy("doc_id")),
    "q22_lang_guess" -> ((s, dir) =>
      operators.TextOps.langGuess(docs(s, dir)).orderBy("doc_id")),
    "q23_fingerprint" -> ((s, dir) =>
      operators.TextOps.fingerprints(docs(s, dir)).orderBy("doc_id")),
    "q24_simhash" -> ((s, dir) =>
      operators.TextOps.simhash(docs(s, dir)).orderBy("doc_id")),
    // oracle contract = UNCAPPED exact Jaccard at any scale (the DuckDB SQL
    // has no frequency cap); the hot-shingle cap is the scale-path
    // preconditioning, pinned separately in DedupSpec
    "q25_jaccard_pairs" -> ((s, dir) =>
      operators.DedupOps.jaccardPairs(docs(s, dir), 0.12,
        maxShingleDocFreq = Int.MaxValue).orderBy("doc_a", "doc_b")),
    // the CAPPED configuration — the scale-default stop-shingle
    // preconditioning the 100 TB path runs (cap 10 ACTIVATES at sf0.01:
    // max observed shingle doc-frequency 29), with its own oracle row so
    // the production semantics are green, not just sbt-pinned
    "q51_jaccard_capped" -> ((s, dir) =>
      operators.DedupOps.jaccardPairs(docs(s, dir), 0.12,
        maxShingleDocFreq = 10).orderBy("doc_a", "doc_b")),
    // oracle contract = UNCAPPED banding (no occupancy census in the SQL);
    // the occupancy cap is the scale-path preconditioning, q56 below
    "q26_minhash_lsh" -> ((s, dir) =>
      operators.DedupOps.lshCandidates(docs(s, dir),
        maxBucketSize = Int.MaxValue).orderBy("doc_a", "doc_b")),
    // the CAPPED banding configuration — band-buckets with occupancy over
    // the cap are dropped before the self-join (cap 2 ACTIVATES at sf0.01:
    // max observed band-bucket occupancy 3), so the oracle checks the
    // preconditioned semantics, not a no-op
    "q56_lsh_capped" -> ((s, dir) =>
      operators.DedupOps.lshCandidates(docs(s, dir),
        maxBucketSize = 2).orderBy("doc_a", "doc_b")),
    "q27_ann_brute" -> ((s, dir) =>
      operators.SimilarityOps.bruteTopK(emb(s, dir)).orderBy("query_id", "rank")),
    "q28_ann_lsh" -> ((s, dir) =>
      operators.SimilarityOps.lshTopK(emb(s, dir)).orderBy("query_id", "rank")),
    // oracle contract = UNCAPPED bucketed cosine; the occupancy cap is the
    // scale-path preconditioning, q57 below
    "q29_cos_dups" -> ((s, dir) =>
      operators.SimilarityOps.cosineDupPairs(emb(s, dir), 0.25,
        maxBucketSize = Int.MaxValue).orderBy("vec_a", "vec_b")),
    // the CAPPED configuration — sign-buckets with occupancy over the cap
    // dropped before the self-join (cap 4 ACTIVATES at sf0.01: max
    // observed sign-bucket occupancy 6)
    "q57_cos_capped" -> ((s, dir) =>
      operators.SimilarityOps.cosineDupPairs(emb(s, dir), 0.25,
        maxBucketSize = 4).orderBy("vec_a", "vec_b")),
    "q30_multimodal" -> ((s, dir) =>
      operators.Multimodal.decodedMeta(s, docs(s, dir)).orderBy("doc_id")),
    // real byte-level PNG header decode over synthesized valid containers:
    // the oracle recomputes dims from the doc_id arithmetic, the engine
    // parses them out of the bytes — agreement proves the decode is real
    "q31_png_decode" -> ((s, dir) =>
      operators.Multimodal.decodedPng(s, docs(s, dir)).orderBy("doc_id")),
    // near-dup clusters: connected components over the LSH candidate graph
    // (oracle = DuckDB recursive CTE computing min reachable doc_id)
    "q32_dup_clusters" -> ((s, dir) =>
      operators.DedupOps.dupClusters(docs(s, dir)).orderBy("doc_id")),
    "q33_sample_stratified" -> ((s, dir) =>
      operators.SampleOps.stratifiedSample(
        docs(s, dir), operators.SampleOps.defaultRates(s)).orderBy("doc_id")),
    "q34_vocab_topk" -> ((s, dir) =>
      operators.TextOps.vocabTopK(docs(s, dir))
        .orderBy(col("freq").desc, col("token"))),
    "q35_frame_sample" -> ((s, dir) =>
      operators.Multimodal.sampleFrames(s, docs(s, dir))
        .orderBy("doc_id", "frame_idx")),
    // PII scrub over the transcripts (syslog/CEF payloads carry IPv4s):
    // map-side regex masking + per-row audit counts
    "q36_ip_scrub" -> ((s, dir) => {
      operators.TextOps.piiScrub(
        transcripts(s, dir), Seq("conv_id", "turn_idx"))
        .orderBy("conv_id", "turn_idx")
    }),
    // gap-based sessionization over (conv_id, ts)
    "q37_sessionize" -> ((s, dir) =>
      operators.ConversationOps
        .sessionize(transcripts(s, dir))
        .orderBy("conv_id", "turn_idx")),
    // per-doc top terms by tf x (N/df) rational TF-IDF
    "q38_tfidf_topk" -> ((s, dir) =>
      operators.TextOps.tfidfTopK(docs(s, dir)).orderBy("doc_id", "rank")),
    // benchmark decontamination: shingle overlap vs the doc_id%50==0 set
    "q39_decontaminate" -> ((s, dir) =>
      operators.DedupOps.decontaminate(docs(s, dir)).orderBy("doc_id")),
    // Gopher-style quality filter: signals + keep/drop with audit reason
    "q40_quality_filter" -> ((s, dir) =>
      operators.TextOps.qualityFilter(docs(s, dir)).orderBy("doc_id")),
    // real WAV/RIFF header decode (little-endian complement of q31's PNG)
    "q41_wav_decode" -> ((s, dir) =>
      operators.Multimodal.decodedWav(s, docs(s, dir)).orderBy("doc_id")),
    // token-budget sequence packing per source shard (prefix-sum fill)
    "q42_pack_sequences" -> ((s, dir) =>
      operators.SampleOps.packSequences(docs(s, dir)).orderBy("doc_id")),
    // BM25-style corpus search for a fixed term query (rational idf,
    // sorted-fold scoring for cross-engine bit-equality)
    "q43_bm25_search" -> ((s, dir) =>
      operators.TextOps.bm25Search(docs(s, dir), Seq("spark", "window", "join"))
        .orderBy(col("score").desc, col("doc_id"))),
    // per-language corpus profile: exact token-length quartiles
    "q44_corpus_profile" -> ((s, dir) =>
      operators.TextOps.corpusProfile(docs(s, dir)).orderBy("lang")),
    // trained-IVF ANN serving path: frozen k-means quantizer (IvfModel),
    // 2-of-8 cell probes, exact rerank — recall vs q27's brute force is
    // pinned >=0.9 in SimilaritySpec
    "q45_ivf_ann" -> ((s, dir) =>
      operators.SimilarityOps.ivfFrozenTopK(emb(s, dir), operators.IvfModel.centroids)
        .orderBy("query_id", "rank")),
    // cross-source shingle-overlap matrix (which ingestion sources
    // duplicate each other — curation before per-doc dedup)
    "q46_source_overlap" -> ((s, dir) =>
      operators.DedupOps.sourceOverlap(docs(s, dir)).orderBy("source_a", "source_b")),
    // PMI-ranked bigram collocations (rational score, bit-exact)
    "q47_collocations" -> ((s, dir) =>
      operators.TextOps.collocations(docs(s, dir))
        .orderBy(col("score").desc, col("t1"), col("t2"))),
    // SFT-sample assembly: conversation -> ordered training document with
    // the assistant-span character count for loss masking
    "q48_render_convs" -> ((s, dir) =>
      operators.ConversationOps
        .renderConversations(transcripts(s, dir))
        .orderBy("conv_id")),
    // long-doc chunking: max-64-token windows, 16-token overlap (the
    // splitting complement of q42's packing)
    "q49_chunk_docs" -> ((s, dir) =>
      operators.SampleOps.chunkDocuments(docs(s, dir)).orderBy("doc_id", "chunk_idx")),
    // dedup materialized: the clean corpus, one keeper per near-dup
    // cluster with its cluster size (q32's resolution put to work)
    "q50_dedup_corpus" -> ((s, dir) =>
      operators.DedupOps.dedupedCorpus(docs(s, dir)).orderBy("doc_id")),
    // embedding near-dup clusters: the same star-contraction resolution
    // over the q29 cosine candidate graph (semantic dedup's cluster step)
    "q52_cos_clusters" -> ((s, dir) =>
      operators.SimilarityOps.cosineDupClusters(emb(s, dir)).orderBy("vec_id")),
    // and its materialization: one keeper per cosine cluster + size —
    // the embedding-space analog of q50
    "q53_embed_dedup" -> ((s, dir) =>
      operators.SimilarityOps.dedupedByEmbedding(emb(s, dir)).orderBy("vec_id")),
    // the data-mixing step: per-source token budgets -> deterministic
    // pseudo-shuffled prefix per source (retry-stable, incremental)
    "q54_mix_budget" -> ((s, dir) =>
      operators.SampleOps.mixByTokenBudget(
        docs(s, dir), operators.SampleOps.defaultBudgets(s)).orderBy("doc_id")),
    // semantic decontamination: max cosine vs the broadcast bench set —
    // catches paraphrased eval leakage the shingle check (q39) misses
    "q55_embed_decontam" -> ((s, dir) =>
      operators.SimilarityOps.embedDecontaminate(emb(s, dir)).orderBy("vec_id")),
    // the TWO-LEVEL prefix-sum mix: bit-identical output to q54 under the
    // same oracle, but the heavy window partitions by (source, key-chunk)
    // so a dominant source no longer funnels into one reducer — the
    // scale-path upgrade q54's scaladoc documented, now oracle-green
    "q58_mix_two_level" -> ((s, dir) =>
      operators.SampleOps.mixByTokenBudgetTwoLevel(
        docs(s, dir), operators.SampleOps.defaultBudgets(s)).orderBy("doc_id")),
    // PQ-ADC ANN serving path: frozen product-quantizer codebooks
    // (PqModel), compressed-domain candidate scan (32x smaller than raw
    // vectors), per-query broadcast lookup tables, exact rerank of the
    // ADC shortlist only — recall vs q27's brute force pinned in
    // SimilaritySpec
    "q59_pq_ann" -> ((s, dir) =>
      operators.SimilarityOps.pqTopK(emb(s, dir), operators.PqModel.codebooks)
        .orderBy("query_id", "rank")),
    // temperature-scaled mixing (alpha=0.5): per-source budgets DERIVED
    // from the corpus via integer-sqrt weights (exact cross-engine
    // arithmetic), then the same deterministic prefix mix as q54
    "q60_mix_temperature" -> ((s, dir) =>
      operators.SampleOps.mixByTemperature(docs(s, dir)).orderBy("doc_id")),
    // winnowing fingerprint index (SIGMOD'03 window-minima, w=4): the
    // ~2/(w+1)-density replacement for the full shingle index
    "q61_winnow_fp" -> ((s, dir) =>
      operators.DedupOps.winnowFingerprints(docs(s, dir)).orderBy("doc_id", "fp")),
    // containment detection (Broder's coefficient over winnowed
    // fingerprints): the ASYMMETRIC near-dup complement of q25 — catches a
    // doc embedded inside a longer one. Oracle contract = UNCAPPED; the
    // boilerplate-fingerprint cap is the scale path, q63 below
    "q62_containment" -> ((s, dir) =>
      operators.DedupOps.containmentPairs(docs(s, dir), 0.5,
        maxFpDocFreq = Int.MaxValue).orderBy("doc_a", "doc_b")),
    // the CAPPED configuration — cap 8 ACTIVATES at sf0.01 (max observed
    // fp doc-frequency 18), so the preconditioned semantics are oracle-green
    "q63_containment_capped" -> ((s, dir) =>
      operators.DedupOps.containmentPairs(docs(s, dir), 0.5,
        maxFpDocFreq = 8).orderBy("doc_a", "doc_b")),
    // cluster-balanced semantic sampling: frozen-IVF cell assignment + a
    // deterministic hash-ordered prefix of <= perCell vectors per cell
    // (flattens semantic-mode imbalance; perCell=40 TRUNCATES every cell
    // at sf0.01 — occupancies run 53-74 — so the budget is ACTIVE)
    "q64_cell_sample" -> ((s, dir) =>
      operators.SimilarityOps.cellBalancedSample(emb(s, dir), operators.IvfModel.centroids)
        .orderBy("vec_id")),
    // incremental delta-vs-corpus dedup (the daily-ingest shape): delta =
    // doc_id%10==0, one-sided exact digest + shingle-jaccard match against
    // the frozen corpus only — corpus-internal pairs never generated
    "q65_incr_dedup" -> ((s, dir) =>
      operators.DedupOps.incrementalDedup(docs(s, dir)).orderBy("doc_id")),
    // exact 13-gram eval decontamination (GPT-3/Pile rule): ANY single
    // shared 13-gram with the bench set disqualifies (1 doc hits at
    // sf0.01 — non-trivially exercised); the any-hit complement of q39's
    // ratio-threshold shingle check
    "q66_ngram13_decontam" -> ((s, dir) =>
      operators.DedupOps.ngramDecontaminate(docs(s, dir)).orderBy("doc_id")),
    // frozen linear quality-model serving (classifier complement of q40's
    // rule filter): integer weights x integer features, monotone-link
    // decision as integer comparison (389/500 keep at sf0.01)
    "q67_quality_model" -> ((s, dir) =>
      operators.TextOps.qualityModelScore(docs(s, dir)).orderBy("doc_id")),
    // margin-based bitext mining (Artetxe&Schwenk ratio rule): mutual best
    // matches across the two vec_id-parity sides, scored relative to both
    // endpoints' top-k neighborhoods; sign-LSH bucket candidates
    "q68_margin_mining" -> ((s, dir) =>
      operators.SimilarityOps.marginBitextPairs(emb(s, dir)).orderBy("src_id")),
    // turn-level exact dedup across conversations (SFT boilerplate
    // hygiene): digest-keyed, text never shuffles, deterministic keeper
    "q69_turn_dedup" -> ((s, dir) =>
      operators.ConversationOps.turnDedup(transcripts(s, dir))
        .orderBy("conv_id", "turn_idx")),
    // per-source ingest telemetry over the q65 verdicts (re-crawl gating):
    // exact/near/new split + dup rate per delta source
    "q70_ingest_report" -> ((s, dir) =>
      operators.DedupOps.ingestReport(docs(s, dir)).orderBy("source")),
    // duplicated-SPAN extraction (within-document complement of doc-level
    // dedup, Lee et al. ACL'22): maximal runs of positional 3-grams shared
    // across documents, min-run filter ACTIVE at sf0.01 (3724 raw islands
    // -> 311 spans over 259 docs)
    "q71_dup_spans" -> ((s, dir) =>
      operators.DedupOps.dupSpans(docs(s, dir)).orderBy("doc_id", "span_start")),
    // span-removal materialization (q71's pipeline terminal): every doc
    // rebuilt with its duplicated spans stripped — the strip-all boilerplate
    // policy, vs the keep-one-copy doc-level ops q50/q53/q65
    "q72_strip_spans" -> ((s, dir) =>
      operators.DedupOps.stripSpans(docs(s, dir)).orderBy("doc_id")),
    // stupid-backoff trigram LM scoring (CCNet-style predictability filter):
    // reference shard doc_id%5!=0 trains, the rest is scored; all three
    // backoff tiers ACTIVE at sf0.01 (3729 tri / 1434 bi / 2 uni positions;
    // 91 of 100 scored docs back off at least once)
    "q73_lm_score" -> ((s, dir) =>
      operators.TextOps.stupidBackoff(docs(s, dir)).orderBy("doc_id")),
    // count-min-sketch heavy-hitter audit: 4x64 counter grid (fixed-size
    // corpus-wide state) vs the exact top-25; overestimate rows = genuine
    // hash collisions at this width
    "q74_cms_audit" -> ((s, dir) =>
      operators.TextOps.cmsHeavyHitters(docs(s, dir))
        .orderBy(col("exact_cnt").desc, col("token"))),
    // Gopher repetition filters (the within-doc axis q40 does not cover):
    // dup-2/3-gram + top-2-gram position shares, keep at paper thresholds
    "q75_repetition" -> ((s, dir) =>
      operators.TextOps.repetitionMetrics(docs(s, dir)).orderBy("doc_id")),
    // conversation schema validation (SFT loader preflight): dup/gap turn
    // indexes, role repeats, empty turns, opener role; ACTIVE at sf0.01
    // (97/100 convs gapped, 19 open with user)
    "q76_conv_validate" -> ((s, dir) =>
      operators.ConversationOps.validateConversations(transcripts(s, dir))
        .orderBy("conv_id")),
    // DSIR-shaped importance weighting: hashed-bigram target/raw count
    // vectors (2x1024 longs of model state, broadcast), mean likelihood-
    // ratio score per raw doc (ln-free portability surrogate, documented)
    "q77_dsir_weights" -> ((s, dir) =>
      operators.TextOps.dsirWeights(docs(s, dir)).orderBy("doc_id")),
    // hard-negative mining: per-query top-k by cosine EXCLUDING the
    // query's q52 near-dup cluster (transitive positives dropped, not just
    // direct pairs) — the contrastive-training sample generator
    "q78_hard_negatives" -> ((s, dir) =>
      operators.SimilarityOps.hardNegatives(emb(s, dir))
        .orderBy("query_id", "rank")),
    // curriculum ordering: global rank over (quality desc, doc_id) built
    // two-level (histogram offsets + per-score windows), equal-population
    // phase buckets — identical to the naive single-task rank
    "q79_curriculum" -> ((s, dir) =>
      operators.SampleOps.curriculumOrder(docs(s, dir)).orderBy("doc_id")),
    // BPE merge learning (ACL'16): first 3 merges over the word-frequency
    // vocab — one corpus pass, then vocab-sized rounds; lexicographic ties
    "q80_bpe_merges" -> ((s, dir) =>
      operators.TextOps.bpeMerges(docs(s, dir)).orderBy("round")),
    // packing-efficiency telemetry (batch-slot utilization sheet): per
    // source over the q42 assignment
    "q81_pack_efficiency" -> ((s, dir) =>
      operators.SampleOps.packEfficiency(docs(s, dir)).orderBy("source")),
    // MinHash estimator calibration: per-candidate signature-implied
    // Jaccard vs exact shingle Jaccard + |err| (the q74 audit pattern on
    // the dedup stack)
    "q82_minhash_audit" -> ((s, dir) =>
      operators.DedupOps.minhashAudit(docs(s, dir)).orderBy("doc_a", "doc_b")),
    // ingest dup-rate timeline (q69's census on the time axis): per-hour
    // turn counts + re-ingest fraction, digest-keyed, text never shuffles
    "q83_dup_timeline" -> ((s, dir) =>
      operators.ConversationOps.ingestDupTimeline(transcripts(s, dir))
        .orderBy("window_start")),
    // per-source shard report card: volume + q67 keep rate + exact-dup
    // rate, one row per ingestion source
    "q84_source_report" -> ((s, dir) =>
      operators.TextOps.sourceQualityReport(docs(s, dir)).orderBy("source")),
    // the composed curation pipeline (capstone): dedup -> quality ->
    // decontaminate -> mix, with per-stage attribution; the oracle
    // recomputes the whole chain independently
    "q85_curation" -> ((s, dir) =>
      operators.SampleOps.curationPipeline(docs(s, dir)).orderBy("doc_id")),
    // leakage-free split: split key = hash of the near-dup CLUSTER keeper,
    // so rephrasings never straddle train/val/test
    "q86_cluster_split" -> ((s, dir) =>
      operators.SampleOps.clusterSplit(docs(s, dir)).orderBy("doc_id")),
    // content-defined chunking (LBFS/rsync family): variable chunks cut at
    // rolling-hash anchors + shared-block census — boundaries survive
    // prefix edits, unlike fixed-width blocks
    "q87_cdc_chunks" -> ((s, dir) =>
      operators.DedupOps.cdcChunks(docs(s, dir)).orderBy("doc_id", "chunk_idx")),
    // BPE serving: vocab-level merge application + per-doc compression
    // (symbols per token under the 3 learned merges)
    "q88_bpe_apply" -> ((s, dir) =>
      operators.TextOps.bpeApply(docs(s, dir)).orderBy("doc_id")))

  // documents/embeddings ship as ONE parquet file each = one input split;
  // spread them so per-doc compute (shingling, hashing, dot products)
  // parallelizes instead of serializing on a single task.
  private def docs(s: SparkSession, dir: String): DataFrame = {
    Pipeline.configure(s)
    s.read.parquet(s"$dir/documents.parquet")
      .repartition(math.max(s.sparkContext.defaultParallelism, 8))
  }
  private def emb(s: SparkSession, dir: String): DataFrame = {
    Pipeline.configure(s)
    s.read.parquet(s"$dir/embeddings.parquet")
      .repartition(math.max(s.sparkContext.defaultParallelism, 8))
  }

  def oracleSql: Map[String, String] = Oracle.sql
}
