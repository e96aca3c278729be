package graft

import java.sql.Timestamp
import graft.operators.ConversationOps

/** Sessionization edge cases the oracle equality can't isolate: exact-gap
  * boundaries, per-conversation restarts, single-turn conversations.
  */
class ConversationOpsSpec extends SparkSpec {

  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gaps strictly greater than gapSec") {
    val rows = Seq(
      // conv a: 0s, +3600s (exactly the gap -> SAME session), +3601s after
      ("a", 0, t("2026-01-01 00:00:00")),
      ("a", 1, t("2026-01-01 01:00:00")),
      ("a", 2, t("2026-01-01 02:00:01")),
      // conv b: single turn
      ("b", 0, t("2026-01-01 05:00:00"))
    ).toDF("conv_id", "turn_idx", "ts")
    val out = ConversationOps.sessionize(rows, gapSec = 3600)
      .orderBy("conv_id", "turn_idx").collect()
    assert(out.map(r => (r.getString(0), r.getInt(2))).toSeq ==
      Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1)))
    assert(out(0).getAs[String]("session_id") == "a#1")
    assert(out(2).getAs[String]("session_id") == "a#2")
    // numbering restarts per conversation
    assert(out(3).getAs[String]("session_id") == "b#1")
  }
}
