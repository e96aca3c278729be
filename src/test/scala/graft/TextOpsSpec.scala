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
}
