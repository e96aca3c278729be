package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, Intermediates, SimilarityOps}

/** Focused pins for the round-6 optimization rewrites: each test checks the
  * NEW shape produces exactly the OLD shape's rows, on inputs built to
  * exercise the rewritten branch (not just the happy path).
  */
class OptimizationR06Spec extends SparkSpec {

  private def docsOf(texts: Seq[String]): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", s"src${i % 3}")
    }.toDF("doc_id", "text", "lang", "source")
  }

  test("star half-round window rewrite: identical components vs reference label propagation") {
    import spark.implicits._
    // a path (diameter > 2), a triangle, a star and singletons — the shapes
    // that distinguish large/small-star behavior from naive propagation
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // path
      (10L, 11L), (11L, 12L), (10L, 12L),     // triangle
      (20L, 21L), (20L, 22L), (20L, 23L))     // star
      .toDF("doc_a", "doc_b")
    val docs = (1L to 5L) ++ Seq(10L, 11L, 12L, 20L, 21L, 22L, 23L, 99L)
    val docsDf = docs.toDF("doc_id")
    val got = DedupOps.clustersFromEdgesStar(docsDf, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 99L -> 99L)
    assert(got == want)
  }

  test("capped pair expansion == uncapped self-join when no key reaches the cap") {
    // shared 3-gram runs across doc groups; cap far above any doc-frequency
    // so BOTH code paths (expansion when capped, self-join when uncapped)
    // see the identical candidate space
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta epsilon eta",
      "alpha beta gamma theta iota kappa",
      "completely different words here now",
      "completely different words here too")
    val docs = docsOf(texts)
    def rows(df: DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    val viaJoin = rows(DedupOps.jaccardPairs(docs, 0.01, maxShingleDocFreq = Int.MaxValue))
    Intermediates.release(spark)
    val viaExpand = rows(DedupOps.jaccardPairs(docs, 0.01, maxShingleDocFreq = 1000))
    Intermediates.release(spark)
    assert(viaJoin.nonEmpty && viaJoin == viaExpand)

    val cJoin = rows(DedupOps.containmentPairs(docs, 0.1, maxFpDocFreq = Int.MaxValue))
    Intermediates.release(spark)
    val cExpand = rows(DedupOps.containmentPairs(docs, 0.1, maxFpDocFreq = 1000))
    Intermediates.release(spark)
    assert(cJoin.nonEmpty && cJoin == cExpand)

    val lJoin = rows(DedupOps.lshCandidates(docs, maxBucketSize = Int.MaxValue))
    Intermediates.release(spark)
    val lExpand = rows(DedupOps.lshCandidates(docs, maxBucketSize = 1000))
    Intermediates.release(spark)
    assert(lJoin.nonEmpty && lJoin == lExpand)
  }

  test("cosine pair expansion == self-join below the occupancy cap") {
    import spark.implicits._
    // vectors engineered to share sign-buckets in near-dup groups
    val emb = Seq(
      (0L, Array(1.0, 0.9, 0.8, 0.7)),
      (1L, Array(0.99, 0.91, 0.79, 0.71)),
      (2L, Array(-1.0, 0.5, -0.5, 0.2)),
      (3L, Array(-0.98, 0.52, -0.48, 0.19)),
      (4L, Array(0.1, -0.9, 0.8, -0.2)))
      .toDF("vec_id", "embedding")
    def rows(df: DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    val viaJoin = rows(SimilarityOps.cosineDupPairs(emb, 0.5, maxBucketSize = Int.MaxValue))
    val viaExpand = rows(SimilarityOps.cosineDupPairs(emb, 0.5, maxBucketSize = 1000))
    assert(viaJoin.nonEmpty && viaJoin == viaExpand)
  }

  test("lifeFacts contains-prefilter is a sound superset: decoy substrings in other fields change nothing") {
    // a stop whose phrase also appears inside an UNRELATED field value of a
    // different row (the adversarial case for the prefilter), plus a start
    // and a no-fact sampled row
    val start = "<134>1 host dos_attack_id=77 dos_attack_event=\"Attack Started\" " +
      "dos_attack_name=\"Flood\" date_time=\"2026-01-02 03:04:05\" bigip_mgmt_ip=10.0.0.1 x=y]"
    val stop = "<134>1 host dos_attack_id=77 dos_attack_event=\"Attack Stopped\" " +
      "date_time=\"2026-01-02 03:09:05\" bigip_mgmt_ip=10.0.0.1 x=y]"
    // phrase appears only as a value of an unrelated key: must NOT be a fact,
    // and must also survive the prefilter without crashing anything
    val decoy = "<134>1 host dos_attack_id=88 dos_attack_event=\"Attack Sampled\" " +
      "dos_attack_name=\"Attack Stopped\" date_time=\"2026-01-02 03:04:06\" bigip_mgmt_ip=10.0.0.1 x=y]"
    val t = transcriptsOf(Seq(start, stop, decoy))
    val facts = graft.operators.Pipeline
      .lifeFacts(t, graft.sources.Transcripts.utcOffsets(spark))
      .collect()
    // exactly two facts (the start and the stop), both attack_id 77; the
    // decoy's phrase-in-another-field neither creates a fact nor drops one
    assert(facts.length == 2)
    assert(facts.forall(_.getLong(0) == 77L))
    assert(facts.map(_.getBoolean(1)).sorted.toSeq == Seq(false, true))
  }
}
