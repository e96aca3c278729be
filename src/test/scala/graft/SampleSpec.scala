package graft

import org.apache.spark.sql.functions._
import graft.operators.{SampleOps, TextOps}

/** Deterministic sampling + corpus vocabulary: behaviors the oracle check
  * can't see — retry-stable membership, allowlist semantics, and the
  * TakeOrdered (no-global-sort) top-k plan.
  */
class SampleSpec extends SparkSpec {

  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "lang")

  test("stratified sample is a pure function of the row: re-run identical") {
    val docs = docsOf((0L until 200L).map(i =>
      (i, s"text $i", Seq("en", "zh", "es", "de", "fr")((i % 5).toInt))))
    val rates = SampleOps.defaultRates(spark)
    val a = SampleOps.stratifiedSample(docs, rates).collect().map(_.toSeq).toSet
    val b = SampleOps.stratifiedSample(docs, rates).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // every kept row respects its stratum's rate
    SampleOps.stratifiedSample(docs, rates).collect().foreach { r =>
      val rate = if (r.getString(1) == "en") 350L else 700L
      assert(r.getLong(2) < rate)
    }
  }

  test("strata without a rate row are dropped (allowlist semantics)") {
    val docs = docsOf(Seq((1L, "a", "en"), (2L, "b", "xx")))
    val rates = Seq(("en", 1000L)).toDF("lang", "rate_permille")
    val kept = SampleOps.stratifiedSample(docs, rates).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("sequence packing fills per-shard packs with bounded overflow") {
    // shard A: 100+100+100+100 tokens at budget 256 -> prev_cums 0,100,200,300
    // -> packs 0,0,0,1 (pack 0 overflows to 300 < 256+300? bounded by one doc)
    val docs = Seq(
      (1L, Seq.fill(100)("w").mkString(" "), "A"),
      (2L, Seq.fill(100)("w").mkString(" "), "A"),
      (3L, Seq.fill(100)("w").mkString(" "), "A"),
      (4L, Seq.fill(100)("w").mkString(" "), "A"),
      (10L, Seq.fill(300)("w").mkString(" "), "B"),  // single oversized doc: own pack
      (11L, Seq.fill(10)("w").mkString(" "), "B")
    ).toDF("doc_id", "text", "source")
    val out = SampleOps.packSequences(docs, budget = 256)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 10L -> 0L, 11L -> 1L))
    // deterministic: re-run assigns identically (prefix sums, no RNG)
    val again = SampleOps.packSequences(docs, budget = 256)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(again == out)
  }

  test("chunking: overlap-stitched windows reconstruct the document; short docs emit one chunk") {
    val words = (1 to 150).map(i => s"w$i")
    val docs = Seq(
      (1L, words.mkString(" ")),      // 150 tokens -> 3 chunks at (64, 16)
      (2L, "just a short document"))  // under the window -> itself
      .toDF("doc_id", "text")
    val out = SampleOps.chunkDocuments(docs, maxTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx").collect()
    val c1 = out.filter(_.getLong(0) == 1L)
    assert(c1.length == 3 && c1.forall(_.getAs[Int]("n_chunks") == 3))
    // every chunk respects the window; consecutive chunks share exactly
    // `overlap` tokens, so dropping the first 16 of each later chunk and
    // concatenating reconstructs the original token stream
    assert(c1.forall(_.getAs[Int]("n_chunk_tokens") <= 64))
    val stitched = c1.zipWithIndex.flatMap { case (r, i) =>
      val toks = r.getAs[String]("chunk_text").split(" ")
      if (i == 0) toks else toks.drop(16)
    }
    assert(stitched.toSeq == words)
    val c2 = out.filter(_.getLong(0) == 2L)
    assert(c2.length == 1 && c2.head.getAs[String]("chunk_text") == "just a short document")
  }

  test("two-level mix == one-level mix, including under a dominant source") {
    // a corpus where one source holds 90% of the docs — the shape that
    // turns the one-level per-source window into a single-reducer sort
    val docs = ((0L until 450L).map(i => (i, s"tok$i a b c d e", "src0")) ++
      (450L until 500L).map(i => (i, s"tok$i a b", s"src${(i % 19) + 1}")))
      .toDF("doc_id", "text", "source")
    val budgets = SampleOps.defaultBudgets(spark)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // chunks=4 forces multi-chunk sources, so the offset arithmetic is
    // exercised, not degenerate
    assert(rows(SampleOps.mixByTokenBudgetTwoLevel(docs, budgets, chunks = 4))
      == rows(SampleOps.mixByTokenBudget(docs, budgets)))
    // and on the real corpus with the default chunk count
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(4)
    assert(rows(SampleOps.mixByTokenBudgetTwoLevel(real, budgets))
      == rows(SampleOps.mixByTokenBudget(real, budgets)))
    // plan shape: the HEAVY window partitions by (source, chunk) — never by
    // source alone — and the offset/budget dims ride broadcast joins
    val plan = SampleOps.mixByTokenBudgetTwoLevel(docs, budgets)
      .queryExecution.executedPlan.toString
    assert("""Window \[[^\]]*windowspecdefinition\(source[^,]*, _chunk""".r
      .findFirstIn(plan).isDefined, plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("token-budget mix: prefixes respect budgets, saturate them, and re-run identical") {
    import graft.operators.SampleOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(4)
    val budgets = SampleOps.defaultBudgets(spark)
    val mix = SampleOps.mixByTokenBudget(docs, budgets)
    val budgetMap = budgets.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = mix.collect()
    assert(rows.nonEmpty)
    // every selected doc started strictly under its source's budget
    rows.foreach(r => assert(r.getAs[Long]("prefix_tokens") < budgetMap(r.getString(1))))
    // per source: the budget is saturated unless the source ran out of docs
    val perSourceTotal = docs
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val picked = rs.map(_.getAs[Long]("n_tokens")).sum
      assert(picked >= budgetMap(src) || rs.size == perSourceTotal(src),
        s"$src under budget (${picked}/${budgetMap(src)}) with docs left over")
    }
    // pure function of the input: a second run selects the identical mix
    val again = SampleOps.mixByTokenBudget(docs, budgets)
    assert(mix.except(again).count() == 0 && again.except(mix).count() == 0)
    // plan pin: the text column never enters the per-source window shuffle —
    // only (doc_id, source, n_tokens, _mix_key) crosses the exchange
    val win = mix.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.head
    assert(!win.child.output.map(_.name).contains("text"),
      s"text shuffles into the mix window: ${win.child.output.map(_.name)}")
  }

  test("temperature mix: budgets sum to the total, flatten source skew, derive exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(4)
    val total = 2000L
    val mix = SampleOps.mixByTemperature(docs, total)
    val rows = mix.collect()
    assert(rows.nonEmpty)
    val budgetBySrc = rows.map(r => r.getString(1) -> r.getAs[Long]("token_budget")).toMap

    // floor division loses < 1 token per source: the derived budgets sum
    // into (total - S, total]
    val sumB = budgetBySrc.values.sum
    assert(sumB <= total && sumB > total - budgetBySrc.size,
      s"budget sum $sumB vs total $total over ${budgetBySrc.size} sources")

    // alpha=0.5 FLATTENS: between any two sources the budget ratio must sit
    // strictly inside the raw token-share ratio (sqrt compresses spread)
    val tokBySrc = docs.select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (loSrc, hiSrc) = (tokBySrc.minBy(_._2)._1, tokBySrc.maxBy(_._2)._1)
    if (tokBySrc(hiSrc) > tokBySrc(loSrc) && budgetBySrc.contains(hiSrc) &&
        budgetBySrc.contains(loSrc)) {
      val rawRatio = tokBySrc(hiSrc).toDouble / tokBySrc(loSrc)
      val budRatio = budgetBySrc(hiSrc).toDouble / budgetBySrc(loSrc)
      assert(budRatio < rawRatio,
        s"temperature failed to flatten: budgets $budRatio vs raw $rawRatio")
    }

    // exact integer derivation: budget_s == (total * isqrt(tok_s)) div sum(isqrt)
    val wgt = tokBySrc.view.mapValues(t => math.sqrt(t.toDouble).toLong).toMap
    val wTot = wgt.values.sum
    budgetBySrc.foreach { case (s, b) =>
      assert(b == total * wgt(s) / wTot, s"$s budget $b != derived")
    }

    // retry-stable, like every sampler here
    val again = SampleOps.mixByTemperature(docs, total)
    assert(mix.except(again).count() == 0 && again.except(mix).count() == 0)
  }

  test("vocab top-k counts globally, breaks ties by token, plans as TakeOrdered") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a c d")).toDF("doc_id", "text")
    val top = TextOps.vocabTopK(docs, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // a=3, b=3 (tie -> 'a' first), c=2
    assert(top == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
    val plan = TextOps.vocabTopK(docs, 3).queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k should not globally sort the vocabulary:\n${plan.take(1500)}")
  }

  test("pack efficiency: straddle semantics can overfill, tail packs underfill; exact fill fractions") {
    val docs = Seq(
      (1L, "a b c d", "x"),            // 4 tokens, prev 0  -> pack 0
      (2L, "a b c d e", "x"),          // 5 tokens, prev 4  -> pack 0
      (3L, "a b c d", "x"),            // 4 tokens, prev 9  -> pack 0 (straddles)
      (4L, "a b c d e f g h i", "x"),  // 9 tokens, prev 13 -> pack 1
      (5L, "a b c", "y"))              // 3 tokens           -> pack 0
      .toDF("doc_id", "text", "source")
    val out = SampleOps.packEfficiency(docs, budget = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // x: pack0 holds 13 tokens (doc3 starts below the boundary), pack1 holds 9
    assert(out("x") == (2L, 22L, 13L, 22.0 / 20.0), s"x: ${out("x")}")
    assert(out("y") == (1L, 3L, 3L, 3.0 / 10.0), s"y: ${out("y")}")
  }

  test("cluster split: whole near-dup components share a split; assignment is a pure function") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(4)
    val out = SampleOps.clusterSplit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
    val byCluster = out.groupBy(_._2._1)
    // every component is split-pure
    byCluster.foreach { case (c, ms) =>
      assert(ms.map(_._2._2).distinct.length == 1, s"cluster $c straddles splits")
    }
    // the guarantee is non-vacuous: multi-doc clusters exist, and at least
    // one contains docs whose DOC-keyed permille buckets differ (a naive
    // doc_id hash would have torn it apart)
    val multi = byCluster.filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture must contain near-dup clusters")
    def docBucket(id: Long) = ((id % 999983L) * 2654435761L) % 1000L
    def side(b: Long) = if (b < 100) "test" else if (b < 200) "val" else "train"
    assert(multi.values.exists(ms => ms.map(m => side(docBucket(m._1))).distinct.length > 1),
      "no cluster demonstrates the doc-hash tear — fixture too small")
    // deterministic re-run
    val again = SampleOps.clusterSplit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("curation pipeline: first failing stage wins; bench-keeper dups drop; budget truncates survivors") {
    def alt(stop: String, pre: String, pairs: Int) =
      (1 to pairs).map(i => s"$stop ${pre}$i").mkString(" ")
    val bench = Seq.fill(30)("the").mkString(" ")       // id 0: the bench doc
    val docs = Seq(
      (0L, bench, "src1"),
      (1L, alt("the", "k", 20), "src1"),                 // clean keeper -> selected
      (51L, alt("the", "k", 20), "src1"),                // byte-dup of 1 -> exact_dup
      (52L, bench, "src1"),                              // dup whose KEEPER is the bench doc
      (2L, "zz!!!!", "src1"),                            // fails quality
      (3L, Seq.fill(9)("the").mkString(" ") + " qq", "src1"), // 1/2 shingles from bench
      (4L, alt("the", "m", 20), "src1"),                 // clean -> selected
      (5L, alt("of", "f5x", 300), "src0"),               // 600 tokens each; src0
      (6L, alt("of", "f6x", 300), "src0"),               //  budget 1000: prefix rule
      (7L, alt("of", "f7x", 300), "src0"))               //  admits 2, drops 1
      .toDF("doc_id", "text", "source")
    val out = SampleOps.curationPipeline(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getString(6))).toMap
    assert(!out.contains(0L), "bench docs are not training candidates")
    assert(out(1L) == (true, true, true, true, "selected"), s"1: ${out(1L)}")
    assert(out(51L)._5 == "exact_dup" && !out(51L)._1)
    // the subtle one: 52's keeper is the BENCH doc -> still an exact_dup drop
    assert(out(52L)._5 == "exact_dup", s"52: ${out(52L)}")
    assert(out(2L)._5 == "quality" && out(2L)._1, s"2: ${out(2L)}")
    assert(out(3L)._5 == "contaminated" && out(3L)._2, s"3: ${out(3L)}")
    assert(out(4L)._5 == "selected")
    // src0 survivors: 3 x 600 tokens against budget 1000 -> prefix rule
    // (prev_cum < budget) admits exactly two, the third is over_budget
    val trio = Seq(5L, 6L, 7L).map(out(_)._5)
    assert(trio.count(_ == "selected") == 2 && trio.count(_ == "over_budget") == 1,
      s"trio: $trio")
    graft.operators.Intermediates.release(spark)
  }

  test("curriculum order: two-level rank == naive global rank, incl. score ties; phases balance") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(4)
    val out = SampleOps.curriculumOrder(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the naive single-window rank (fine at test scale) must agree on every row
    val naive = TextOps.qualityModelScore(docs)
      .withColumn("global_rank",
        row_number().over(Window.orderBy(col("qm_score").desc, col("doc_id"))).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Long]("global_rank"))).toMap
    assert(out.size == naive.size)
    naive.foreach { case (id, (score, rank)) =>
      assert(out(id)._1 == score && out(id)._2 == rank,
        s"doc $id: two-level ${out(id)} vs naive ($score, $rank)")
    }
    // ties exist in the fixture (else the per-score window is vacuous)
    assert(naive.values.map(_._1).toSeq.distinct.size < naive.size,
      "fixture must contain tied scores")
    // equal-population phases: with N divisible by 4 the split is exact
    val byPhase = out.values.groupBy(_._3).view.mapValues(_.size).toMap
    assert(byPhase.keySet == Set(0L, 1L, 2L, 3L), s"phases: $byPhase")
    assert(byPhase.values.max - byPhase.values.min <= 1, s"unbalanced: $byPhase")
    // the corpus-side rank window is PARTITIONED (by qm_score) — the
    // histogram offsets are the only unpartitioned window
    val plan = SampleOps.curriculumOrder(docs).queryExecution.executedPlan.toString()
    assert(plan.contains("windowspecdefinition(qm_score"),
      s"expected a qm_score-partitioned rank window:\n${plan.take(2000)}")
  }
}
