package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass key=value tokenizer: a custom Catalyst Expression
  * replacing the `regexp_extract_all` + higher-order-function chain on the
  * parse hot path (SURVEY.md §7.4's "optional perf pass" custom Expression).
  *
  * The hand-rolled scanner (KvScan) reproduces the match semantics of the
  * reference regexes — bbn_syslog.rb:60 (`cef=false`) and bbn_cef.rb:64
  * (`cef=true`), including greedy-value backtracking to the lookahead
  * boundary, the `]` / end-of-input anchors, the no-underscore CEF key
  * class (and its pair-poisoning effect), empty-value drops and
  * last-assignment-wins duplicates — without java.util.regex overhead or
  * per-row array-of-strings intermediates. Equivalence to the repo's regex
  * path is enforced by a differential property test (F5ParseSpec) and the
  * DuckDB oracle.
  *
  * One deliberate divergence from the RUBY post-processing (not from the
  * regex): on consecutive '=' signs Ruby's `split("=")` yields
  * `entry[1]=nil` for `k==` (pair dropped) and `""` for `k==v`, while this
  * scanner — like the repo's regex baseline it is differential-tested
  * against — keeps `{k: "="}` and `{k: "=v"}` respectively. No reference
  * fixture or synthesized payload contains a `==` run, so the difference is
  * unobservable on real F5 traffic; documented here rather than silently
  * matched, because Ruby's behavior is an artifact of split(), not of the
  * published KV grammar.
  *
  * Codegen emits a single static call, so the expression stays inside
  * WholeStageCodegen spans.
  */
case class KvExtract(child: Expression, cef: Boolean) extends UnaryExpression {
  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = false)
  override def prettyName: String = "kv_extract"

  override protected def nullSafeEval(input: Any): Any =
    KvScan.scan(input.asInstanceOf[UTF8String], cef)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KvScan.scan($c, $cef)")

  override protected def withNewChildInternal(newChild: Expression): KvExtract =
    copy(child = newChild)
}

object KvExtract {
  def apply(c: Column, cef: Boolean): Column =
    GraftBridge.column(KvExtract(GraftBridge.expression(c), cef))
}

object KvScan {

  @inline private def isKeyChar(c: Byte, cef: Boolean): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      (!cef && c == '_')

  // value class is identical for both patterns: [a-zA-Z0-9:_/.\-\s]
  @inline private def isValChar(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == ':' || c == '_' || c == '/' || c == '.' || c == '-' || isWs(c)

  // java.util.regex \s = [ \t\n\x0B\f\r]
  @inline private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** Lookahead boundary at position j: `\]` (syslog) / end-of-input (CEF) /
    * `\s[key-class]+=`.
    */
  private def boundaryAt(s: Array[Byte], j: Int, n: Int, cef: Boolean): Boolean = {
    if (!cef && j < n && s(j) == ']') return true
    if (cef && j == n) return true
    if (j < n && isWs(s(j))) {
      var p = j + 1
      val st = p
      while (p < n && isKeyChar(s(p), cef)) p += 1
      p > st && p < n && s(p) == '='
    } else false
  }

  /** One pass over the text; returns map<string,string>, last-wins dups,
    * empty values dropped (Ruby `entry[1] != nil` guards).
    *
    * Operates directly on UTF-8 bytes: every class in both patterns is
    * pure ASCII and every byte of a multi-byte UTF-8 sequence has the high
    * bit set, so it fails exactly the class tests the char-level regex
    * fails — byte-wise scanning is equivalent, and match boundaries always
    * fall on ASCII bytes (valid UTF-8 slice points). No per-row String
    * materialization, no char[] copies.
    */
  def scan(input: UTF8String, cef: Boolean): MapData = {
    val s = input.getBytes
    val n = s.length
    val out = new java.util.LinkedHashMap[UTF8String, UTF8String]()
    var i = 0
    while (i < n) {
      if (isKeyChar(s(i), cef)) {
        var k = i
        while (k < n && isKeyChar(s(k), cef)) k += 1
        if (k < n && s(k) == '=') {
          var e = k
          while (e < n && s(e) == '=') e += 1 // [=]+ greedy
          var v = e
          while (v < n && isValChar(s(v))) v += 1
          // greedy value with backtracking: longest j with a boundary
          var j = v
          var found = -1
          while (j >= e && found < 0) {
            if (boundaryAt(s, j, n, cef)) found = j else j -= 1
          }
          if (found >= 0) {
            // value runs from after the FIRST '=' (regex-path semantics;
            // diverges from Ruby split("=") on '==' runs — see class doc)
            if (found > k + 1) out.put(
              UTF8String.fromBytes(s, i, k - i),
              UTF8String.fromBytes(s, k + 1, found - (k + 1)))
            i = found // find() resumes at match end (lookahead not consumed)
          } else {
            i += 1 // no boundary reachable: regex advances one position
          }
        } else {
          i = k // shorter starts inside this key run fail identically
        }
      } else {
        i += 1
      }
    }
    val keys = new Array[Any](out.size)
    val vals = new Array[Any](out.size)
    var idx = 0
    val it = out.entrySet().iterator()
    while (it.hasNext) {
      val entry = it.next()
      keys(idx) = entry.getKey
      vals(idx) = entry.getValue
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
