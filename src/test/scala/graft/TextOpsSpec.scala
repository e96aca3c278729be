package graft

import graft.operators.TextOps

/** Pins the BPE-ish tokenization on punctuation-rich input — the synthetic
  * corpus is all clean lowercase words, so the oracle equality alone would
  * leave the symbol/digit-run branches unexercised.
  */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("BPE-ish subtokens split letter runs, digit runs, and symbols") {
    val docs = Seq((1L, "hello world42 (x, y)!")).toDF("doc_id", "text")
    val r = firstRow(TextOps.tokenStats(docs))
    // whitespace tokens: hello | world42 | (x, | y)!
    assert(r("n_tokens") == 4L)
    // subtokens: hello | world | 42 | ( | x | , | y | ) | !
    assert(r("n_subtokens") == 9L)
    assert(r("n_chars") == 21L)
    // punct chars: ( , ) !  -> 4 of 21
    assert(math.abs(r("punct_ratio").asInstanceOf[Double] - 4.0 / 21.0) < 1e-12)
  }

  test("clean prose has zero punct ratio and subtokens == words") {
    val docs = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val r = firstRow(TextOps.tokenStats(docs))
    assert(r("n_tokens") == 4L && r("n_subtokens") == 4L)
    assert(r("punct_ratio").asInstanceOf[Double] == 0.0)
  }

  test("piiScrub masks every IPv4 and email and counts them") {
    val rows = Seq(
      (1L, 0, "dvc=172.16.21.41 src=10.0.195.61 mail ops@example.com end"),
      (2L, 0, "no pii here, version 11.6.0 stays"),
      (3L, 0, "edge 1.2.3.4")).toDF("doc_id", "turn_idx", "text")
    val out = TextOps.piiScrub(rows, Seq("doc_id", "turn_idx"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_ips") == 2L)
    assert(out(0).getAs[Long]("n_emails") == 1L)
    assert(out(0).getAs[String]("scrubbed_text") ==
      "dvc=<ip> src=<ip> mail <email> end")
    // three-octet version strings are NOT IPs
    assert(out(1).getAs[Long]("n_ips") == 0L)
    assert(out(1).getAs[String]("scrubbed_text").contains("11.6.0"))
    assert(out(2).getAs[String]("scrubbed_text") == "edge <ip>")
  }

  test("tfidfTopK ranks rare tokens above common ones, ties by token") {
    // 3 docs; 'zebra' only in doc 1 (df=1), 'common' in all (df=3)
    val docs = Seq(
      (1L, "common zebra zebra"),
      (2L, "common alpha"),
      (3L, "common beta")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopK(docs, k = 2)
      .orderBy("doc_id", "rank").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // doc 1: zebra tf=2 df=1 -> 2*(3/1)=6; common tf=1 df=3 -> 1
    assert(d1(0).getAs[String]("token") == "zebra" && d1(0).getAs[Double]("score") == 6.0)
    assert(d1(1).getAs[String]("token") == "common" && d1(1).getAs[Double]("score") == 1.0)
    // doc 2: alpha (3.0) above common (1.0)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getAs[String]("token")).toSeq == Seq("alpha", "common"))
    // every doc emits at most k rows
    assert(out.groupBy(_.getLong(0)).forall(_._2.length <= 2))
  }

  test("qualityFilter applies rules in order and reports the FIRST failure") {
    val docs = Seq(
      (1L, "short doc"),                                               // too_short (and no stopwords)
      (2L, Seq.fill(25)("word").mkString(" ")),                        // 25 tokens, no stopwords -> low_stopword
      (3L, ("the a " + Seq.fill(12)("x y").mkString(" ")).trim),       // repeated 2-grams -> repetitive
      (4L, "the a " + (1 to 18).map(i => s"tok$i").mkString(" "))      // 20 distinct tokens, stopwords -> keep
    ).toDF("doc_id", "text")
    val out = TextOps.qualityFilter(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("reject_reason") == "too_short")
    assert(out(1).getAs[String]("reject_reason") == "low_stopword")
    assert(out(2).getAs[String]("reject_reason") == "repetitive")
    assert(out(3).getAs[String]("reject_reason") == null && out(3).getAs[Boolean]("keep"))
    // single-token doc: dup ratio guard (sequence would descend)
    val one = TextOps.qualityFilter(Seq((9L, "solo")).toDF("doc_id", "text")).collect()(0)
    assert(one.getAs[Double]("dup_2gram_ratio") == 0.0)
  }

  test("bm25Search ranks by term rarity and tf saturation; unmatched docs absent") {
    val docs = Seq(
      (1L, "spark spark spark filler filler"),   // high tf on a rare term
      (2L, "spark filler filler filler filler"),
      (3L, "common words only here nothing"),    // no query term -> absent
      (4L, "window join filler filler filler")   // matches two terms
    ).toDF("doc_id", "text")
    val out = TextOps.bm25Search(docs, Seq("spark", "window", "join"), k = 10)
      .collect()
    assert(!out.map(_.getLong(0)).contains(3L))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // more matched terms reported correctly
    assert(byId(4L).getAs[Int]("n_terms_matched") == 2)
    assert(byId(1L).getAs[Int]("n_terms_matched") == 1)
    // tf monotonicity: doc 1 (tf=3) outscores doc 2 (tf=1), same term/length
    assert(byId(1L).getAs[Double]("score") > byId(2L).getAs[Double]("score"))
    // two rare terms outscore one: doc 4 highest
    assert(out.head.getLong(0) == 4L)
  }

  test("collocations rank sticky bigrams first and never cross document boundaries") {
    // "new york": 5 adjacent occurrences, and new/york appear NOWHERE else
    // -> maximal score. The other glue words (is/big/and/busy) also appear
    // in the split docs, doubling their unigram counts and halving their
    // pair scores. Per-doc unique fillers keep noise bigrams under
    // minCount. Boundary check: even docs END with "data", odd docs START
    // with "base" — a (data, base) pair can only arise by erroneously
    // concatenating documents.
    val glue = (1 to 5).map(i => (i.toLong, "new york is big and busy"))
    val split = (6 to 15).map(i =>
      (i.toLong, if (i % 2 == 0) s"is big u${i}a data" else s"base and busy u${i}c"))
    val docs = (glue ++ split).toDF("doc_id", "text")
    val out = TextOps.collocations(docs, k = 30, minCount = 5).collect()
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("new", "york")))
    assert(!pairs.contains(("data", "base")) && !pairs.contains(("base", "data")),
      "bigram crossed a document boundary")
    // the exclusive pair outranks pairs of tokens that also occur apart
    assert(out.head.getString(0) == "new" && out.head.getString(1) == "york",
      s"expected (new, york) first, got ${out.take(3).mkString("; ")}")
  }

  test("tfidf top-k physical plan bounds each doc partition before the rank window") {
    val docs = (1L to 40L).map(i => (i, s"w$i common shared")).toDF("doc_id", "text")
    val plan = TextOps.tfidfTopK(docs).queryExecution.executedPlan.toString()
    // Spark 4 plans rank<=k as WindowGroupLimit: each task keeps k rows per
    // doc_id BEFORE the exchange, so the window never sees the full scored
    // set (the q27-class trap this guards against)
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit partial top-k in plan:\n${plan.take(2000)}")
  }

  test("quality model: score is the exact integer dot product; keep flips at the threshold") {
    // 8 stopwords * 5 + 10 tokens * 1 - 0 punct = 50 >= 40 -> keep
    val good = "the a of and the a of and tok tok"
    // 0 stopwords + 10 tokens - 8 * 2 punct = -6 -> drop
    val bad = "x! y? aa bb cc dd ee ff gg hh"
    val out = TextOps.qualityModelScore(
      Seq((1L, good), (2L, bad)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (50L, true), s"got ${out(1L)}")
    assert(out(2L) == (-6L, false), s"got ${out(2L)}")
  }

  test("stupid backoff: tier selection, exact quotient arithmetic, holdout split") {
    // train shard (id % 5 != 0): uni a:2 b:2 c:1 d:1 x:1 (N=7),
    // bi (a,b):2 (b,c):1 (c,d):1 (b,x):1, tri (a,b,c) (b,c,d) (a,b,x)
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x"),     // train
      (0L, "a b c z d"),                  // scored: tri, uni(z OOV), uni(d)
      (5L, "x b c"),                      // scored: bi tier only
      (10L, "a b"))                       // scored but < 3 tokens: no row
      .toDF("doc_id", "text")
    val out = TextOps.stupidBackoff(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // doc0 pos3: tri (a,b,c) c3=1 / c2ctx(a,b)=2 = 0.5
    //      pos4: (b,c,z) unseen, (c,z) unseen, z OOV -> 0.4^2 * 0/7 = 0.0
    //      pos5: (c,z,d) unseen, (z,d) unseen, d seen -> 0.4^2 * 1/7
    val exp0 = (((0.0 + 0.5) + 0.4 * 0.4 * 0.0 / 7.0) + 0.4 * 0.4 * 1.0 / 7.0) / 3.0
    assert(out(0L) == (3L, exp0, 1L, 0L, 2L), s"doc0: ${out(0L)}")
    // doc5 pos3: tri (x,b,c) unseen, bi (b,c)=1 / c1ctx(b)=2 -> 0.4 * 1/2
    assert(out(5L) == (1L, 0.4 * 1.0 / 2.0, 0L, 1L, 0L), s"doc5: ${out(5L)}")
    // scored docs shorter than a trigram produce no row; train docs never scored
    assert(!out.contains(10L) && !out.contains(1L) && !out.contains(2L))
  }

  test("CMS audit: est >= exact always; signature collisions overestimate by exactly the collider's mass") {
    // "ab" and "ac" share tokenSig (same first byte + length) -> they land
    // in the SAME bucket in every hash row: est = their combined count
    val docs = Seq((0L, Array.fill(5)("ab").mkString(" ")),
      (1L, Array.fill(3)("ac").mkString(" ")),
      (2L, "xyz xyz")).toDF("doc_id", "text")
    val out = TextOps.cmsHeavyHitters(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("ab") == (5L, 8L, 3L), s"ab: ${out.get("ab")}")
    assert(out("ac") == (3L, 8L, 5L), s"ac: ${out.get("ac")}")
    assert(out("xyz") == (2L, 2L, 0L), s"xyz: ${out.get("xyz")}")

    // the CMS one-sided guarantee holds over a real corpus
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(4)
    val audited = TextOps.cmsHeavyHitters(real).collect()
    assert(audited.length == 25)
    audited.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS must never underestimate: ${r}"))
  }

  test("repetition metrics: alternating spam fails, clean prose keeps, degenerate docs are 0-frac") {
    val docs = Seq(
      (0L, "a b a b a b a b"),      // bigrams (a,b)x4 (b,a)x3: all duplicated
      (1L, "c d e f g h i"),        // 6 unique bigrams: top2 = 1/6 <= 0.18
      (2L, "z"))                    // no grams at all: fracs defined as 0
      .toDF("doc_id", "text")
    val out = TextOps.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(out(0L) == (8L, 1.0, 1.0, 4.0 / 7.0, false), s"spam: ${out(0L)}")
    assert(out(1L) == (7L, 0.0, 0.0, 1.0 / 6.0, true), s"clean: ${out(1L)}")
    assert(out(2L) == (1L, 0.0, 0.0, 0.0, true), s"degenerate: ${out(2L)}")
    graft.operators.Intermediates.release(spark)
  }

  test("DSIR weights: target-identical raw doc scores 1.0, disjoint doc scores the smoothed floor") {
    val docs = Seq(
      (0L, "a aa aaa"),    // target shard (0 % 50 == 0)
      (1L, "a aa aaa"),    // raw, feature-identical to target: every term (t+1)/(r+1) = 1
      (2L, "m mm mmm"),    // raw, disjoint: t=0, r=own occurrence -> each term 1/2
      (3L, "q"))           // raw, no bigram: no row
      .toDF("doc_id", "text")
    val out = TextOps.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == (2L, 1.0), s"target-like: ${out.get(1L)}")
    assert(out(2L) == (2L, 0.5), s"disjoint: ${out.get(2L)}")
    assert(!out.contains(0L), "target docs are never scored")
    assert(!out.contains(3L), "feature-less docs emit no row")
    graft.operators.Intermediates.release(spark)
  }

  test("source report card: per-source volume, keep rate, dup rate") {
    val theTen = Seq.fill(10)("the").mkString(" ")  // qm 5*10+10 = 60 -> keep
    val docs = Seq(
      (0L, theTen, "x"), (1L, theTen, "x"),  // byte-identical pair: both dup
      (2L, "zz!!! aa", "x"),                 // qm 2 - 24 = -22 -> drop
      (3L, "a b", "y"))                      // qm 5 + 2 = 7 -> drop, no dup
      .toDF("doc_id", "text", "source")
    val out = TextOps.sourceQualityReport(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("x") == (3L, 22L, 2.0 / 3.0, 2.0 / 3.0), s"x: ${out("x")}")
    assert(out("y") == (1L, 2L, 0.0, 0.0), s"y: ${out("y")}")
  }

  test("BPE merges reproduce the ACL'16 worked example, ties broken lexicographically") {
    // the classic fixture: low x5, lower x2, newest x6, widest x3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower")
      ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val out = TextOps.bpeMerges(docs, merges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (e,s) 9 ties (s,t) 9 -> 'e' < 's'; round 2: (es,t) 9;
    // round 3: (l,o) 7 ties (o,w) 7 -> 'l' < 'o'
    assert(out.toSeq == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)),
      s"got ${out.toSeq}")

    // serving: after (e,s), (es,t), (l,o) the words tokenize to
    // low=[lo w]=2, lower=[lo w e r]=4, newest=[n e w est]=4, widest=[w i d est]=4
    val applied = TextOps.bpeApply(docs, merges = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val nTok = 5 + 2 + 6 + 3
    val nSym = 5 * 2 + 2 * 4 + 6 * 4 + 3 * 4
    assert(applied(0L) == (nTok.toLong, nSym.toLong, nSym.toDouble / nTok.toDouble),
      s"applied: ${applied(0L)}")
  }
}
