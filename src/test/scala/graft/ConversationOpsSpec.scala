package graft

import java.sql.Timestamp
import graft.operators.ConversationOps

/** Sessionization edge cases the oracle equality can't isolate: exact-gap
  * boundaries, per-conversation restarts, single-turn conversations.
  */
class ConversationOpsSpec extends SparkSpec {

  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("renderConversations orders by turn_idx regardless of input order and counts assistant chars") {
    // deliberately shuffled input order; two conversations interleaved
    val t = Seq(
      ("c1", 2, "assistant", "fine thanks", "none", Timestamp.valueOf("2026-01-01 00:02:00")),
      ("c2", 1, "user", "ping", "none", Timestamp.valueOf("2026-01-01 00:00:30")),
      ("c1", 1, "user", "hi how are you", "none", Timestamp.valueOf("2026-01-01 00:01:00")),
      ("c1", 3, "user", "bye", "none", Timestamp.valueOf("2026-01-01 00:03:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val out = ConversationOps.renderConversations(t)
      .orderBy("conv_id").collect()
    assert(out.length == 2)
    val c1 = out(0)
    assert(c1.getAs[String]("rendered") ==
      "user: hi how are you\nassistant: fine thanks\nuser: bye")
    assert(c1.getAs[Int]("n_turns") == 3)
    assert(c1.getAs[Long]("n_assistant_chars") == "fine thanks".length.toLong)
    val c2 = out(1)
    assert(c2.getAs[String]("rendered") == "user: ping")
    assert(c2.getAs[Long]("n_assistant_chars") == 0L)
  }

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

  test("turnDedup keeps the lexicographic-min (conv_id, turn_idx) and never shuffles text") {
    val turns = Seq(
      ("conv-b", 5, "repeated boilerplate line"),
      ("conv-a", 9, "repeated boilerplate line"),
      ("conv-a", 2, "repeated boilerplate line"),
      ("conv-c", 1, "a unique turn"))
      .toDF("conv_id", "turn_idx", "text")
    val out = ConversationOps.turnDedup(turns).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getString(2), r.getInt(3), r.getLong(4), r.getBoolean(5))).toMap
    // keeper is ("conv-a", 2): min conv_id first, then min turn_idx
    for (k <- Seq(("conv-b", 5), ("conv-a", 9), ("conv-a", 2)))
      assert(out(k) == ("conv-a", 2, 3L, true), s"$k -> ${out(k)}")
    assert(out(("conv-c", 1)) == ("conv-c", 1, 1L, false))
    // the join key is the 16-byte digest — the turn text itself must not
    // appear above the exchange (the 10^12-turn shuffle-width contract)
    assert(!ConversationOps.turnDedup(turns).queryExecution.executedPlan.toString
      .linesIterator.exists(l => l.contains("Exchange") && l.contains("text")),
      "text column must not cross an exchange")
  }

  test("dup timeline: re-ingests count against their own hour; same-ts ties break on conv_id") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val turns = Seq(
      ("c1", 0, ts("2026-01-01 10:05:00"), "dup"),   // first occurrence
      ("c2", 3, ts("2026-01-01 10:20:00"), "dup"),   // re-ingest, hour 10
      ("c3", 1, ts("2026-01-01 11:30:00"), "dup"),   // re-ingest, hour 11
      ("c1", 1, ts("2026-01-01 10:40:00"), "uniq"),
      ("a1", 0, ts("2026-01-01 12:00:00"), "tie"),   // same ts: a1 < a2 keeps
      ("a2", 0, ts("2026-01-01 12:00:00"), "tie"))
      .toDF("conv_id", "turn_idx", "ts", "text")
    val out = ConversationOps.ingestDupTimeline(turns).collect()
      .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("2026-01-01 10:00:00.0") == (3L, 1L, 1.0 / 3.0), s"h10: $out")
    assert(out("2026-01-01 11:00:00.0") == (1L, 1L, 1.0), s"h11: $out")
    assert(out("2026-01-01 12:00:00.0") == (2L, 1L, 0.5), s"h12: $out")
  }

  test("conversation validation: each defect counter fires exactly on its defect") {
    val turns = Seq(
      ("good", 0, "user", "hi"), ("good", 1, "assistant", "hello"),
      ("good", 2, "user", "more"), ("good", 3, "assistant", "done"),
      ("dup", 0, "user", "a"), ("dup", 1, "assistant", "b"),
      ("dup", 1, "tool", "c"), ("dup", 2, "assistant", "d"),
      ("gap", 0, "user", "a"), ("gap", 1, "assistant", "b"), ("gap", 5, "user", "c"),
      ("rep", 0, "user", "a"), ("rep", 1, "user", "b"), ("rep", 2, "assistant", "c"),
      ("emp", 0, "user", ""), ("emp", 1, "assistant", "ok"),
      ("solo", 7, "system", "lone"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = ConversationOps.validateConversations(turns).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getLong(6), r.getLong(7), r.getBoolean(8))).toMap
    assert(out("good") == (4L, 0L, 0L, "user", "assistant", 0L, 0L, true))
    // dup idx 1 twice: 1 duplicate, and NOT counted as a gap (0..2 distinct=3)
    assert(out("dup") == (4L, 1L, 0L, "user", "assistant", 0L, 0L, false))
    // idx {0,1,5}: span 6, distinct 3 -> 3 missing
    assert(out("gap") == (3L, 0L, 3L, "user", "user", 0L, 0L, false))
    assert(out("rep") == (3L, 0L, 0L, "user", "assistant", 1L, 0L, false))
    assert(out("emp") == (2L, 0L, 0L, "user", "assistant", 0L, 1L, false))
    // a single turn: no pairs to repeat, first == last, non-user opener
    assert(out("solo") == (1L, 0L, 0L, "system", "system", 0L, 0L, false))
  }
}
