package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Payload templates for the synthetic transcript corpus, defined ONCE as
  * literal/column fragment sequences and rendered twice: as a Catalyst
  * concat() for the Spark-side generator (Transcripts.withText) and as a
  * `||` expression for the DuckDB oracle (graft.Oracle). A single spec
  * guarantees per-turn text equality between the engine under test and the
  * oracle by construction.
  *
  * Fragment column names refer to Transcripts.derived() output columns,
  * which the oracle's derived CTE mirrors name-for-name.
  */
object Payloads {

  sealed trait Frag
  final case class L(s: String) extends Frag // literal
  final case class C(name: String) extends Frag // derived column by name

  type Spec = Vector[Frag]

  /** One corpus branch: slot s, optional extra episode-level condition
    * (SQL string over the derived CTE + the equivalent Column), template.
    */
  final case class Branch(s: Int, condSql: Option[String], condCol: Option[Column], spec: Spec)

  private def kv(key: String, v: Frag): Spec = Vector(L(" " + key + "="), v)
  private def kvs(pairs: (String, Frag)*): Spec =
    pairs.iterator.flatMap { case (k, v) => kv(k, v) }.toVector

  /** Collapse adjacent literals (fewer concat args / shorter SQL). */
  private def squash(spec: Spec): Spec =
    spec.foldLeft(Vector.empty[Frag]) {
      case (acc :+ L(a), L(b)) => acc :+ L(a + b)
      case (acc, f) => acc :+ f
    }

  def render(spec: Spec): Column =
    concat(squash(spec).map {
      case L(s) => lit(s)
      case C(n) => col(n)
    }: _*)

  def renderSql(spec: Spec): String =
    squash(spec).map {
      case L(s) => "'" + s.replace("'", "''") + "'"
      case C(n) => s"CAST($n AS VARCHAR)"
    }.mkString(" || ")

  // ---- shared fragments -------------------------------------------------

  private val hdr: Spec =
    Vector(L("<134>"), C("dt"), L(" "), C("hostname"), L(" info tmm1: "))

  private val deviceKvs: Spec = kvs(
    "device_vendor" -> L("F5"), "device_product" -> L("Advanced Firewall Module"),
    "device_version" -> L("11.6.0"), "hostname" -> C("hostname"),
    "bigip_mgmt_ip" -> C("host"))

  /** "[" + kvs with the first pair's leading space dropped. */
  private def bracket(body: Spec): Spec = body match {
    case L(first) +: rest => (L("[" + first.stripPrefix(" ")) +: rest) :+ L("]")
    case other => (L("[") +: other) :+ L("]")
  }

  private val afmHdrNamed: Spec =
    Vector(L("CEF:0|F5|Advanced Firewall Module|11.6.0|Network DoS Attack|"),
      C("aname"), L("|"), C("sev"), L("|"))

  private val afmFixed: Spec = (kvs(
    "dvchost" -> C("hostname"), "dvc" -> C("host"), "rt" -> C("dt"),
    "act" -> C("act"), "src" -> C("sip"), "spt" -> C("spt"),
    "dst" -> L("10.0.0.254"), "dpt" -> C("dpt")) match {
    case L(first) +: rest => L(first.stripPrefix(" ")) +: rest
    case o => o
  })

  private def asmMsg(status: String): Spec =
    Vector(L("CEF:0|F5|ASM|11.6.0|DOS L7 attack|Source IP-Based Rate Limiting|"),
      C("sev"), L("|")) ++ afmHeadlessAsm(status)

  private def afmHeadlessAsm(status: String): Spec = (kvs(
    "dvchost" -> C("hostname"), "dvc" -> C("host"), "rt" -> C("dt"),
    "act" -> C("act"), "src" -> C("sip"), "request" -> L("/index.php"),
    "cs1" -> C("aid_asm"), "cs1Label" -> L("attack_id"),
    "cs2" -> L(status), "cs2Label" -> L("attack_status"),
    "cs3" -> C("detmode"), "cs3Label" -> L("detection_mode"),
    "cn1" -> C("recv"), "cn1Label" -> L("detection_average"),
    "cn2" -> C("drops"), "cn2Label" -> L("dropped_requests"),
    "cs4" -> C("vs"), "cs4Label" -> L("Virtual Server"),
    "cs5" -> L("/Common/dos"), "cs5Label" -> L("policy_name")) match {
    case L(first) +: rest => L(first.stripPrefix(" ")) +: rest
    case o => o
  })

  // ---- the corpus -------------------------------------------------------

  val branches: Vector[Branch] = {
    val syStart = hdr ++ bracket(deviceKvs ++ kvs(
      "date_time" -> C("dt"), "context_name" -> C("vs"), "route_domain" -> L("0"),
      "partition_name" -> L("Common"), "flow_id" -> C("flow"),
      "dos_attack_name" -> C("aname"), "dos_attack_id" -> C("aid_sy"),
      "dos_attack_event" -> L("Attack Started"), "severity" -> C("sev"),
      "errdefs_msg_name" -> L("Network DoS Event")))

    def sySample(withCtx: Boolean) = {
      val ctx = if (withCtx) kvs("context_name" -> C("vs")) else Vector.empty[Frag]
      val dns = if (withCtx) kvs("dns_query_name" -> C("qn"), "dns_query_type" -> L("A")) else Vector.empty[Frag]
      val cat: Frag = if (withCtx) C("cat1") else L("Network DoS Event")
      hdr ++ bracket(
        kvs("hostname" -> C("hostname"), "bigip_mgmt_ip" -> C("host"), "date_time" -> C("dt")) ++
          ctx ++ kvs("errdefs_msg_name" -> cat, "dos_attack_id" -> C("base"),
          "dos_attack_event" -> L("Attack Sampled"), "dos_packets_received" -> C("recv"),
          "dos_packets_dropped" -> C("drops"), "action" -> C("act")) ++
          dns ++ kvs("source_ip" -> C("sip"), "source_port" -> C("spt"),
          "dest_ip" -> L("10.0.0.254"), "dest_port" -> C("dpt"), "vlan" -> C("vlan")))
    }

    val syStop = hdr ++ bracket(kvs(
      "hostname" -> C("hostname"), "bigip_mgmt_ip" -> C("host"),
      "date_time" -> C("dt"), "dos_attack_id" -> C("aid_sy"),
      "dos_attack_event" -> L("Attack Stopped")))

    val sySync = hdr ++ bracket(deviceKvs ++ kvs(
      "date_time" -> C("dt"), "action" -> C("act"), "context_name" -> C("vs"),
      "route_domain" -> L("0"), "partition_name" -> L("Common"), "flow_id" -> C("flow"),
      "dos_attack_id" -> C("aid_syn"), "dos_attack_event" -> L("TCP Syncookie"),
      "severity" -> C("sev"), "errdefs_msg_name" -> L("Network DoS Event")))

    def syTraffic(statType: String, counters: Spec) = hdr ++ bracket(
      kvs("hostname" -> C("hostname"), "bigip_mgmt_ip" -> C("host")) ++ deviceKvs ++
        kvs("context_name" -> C("vs"), "date_time" -> C("dt"),
          "partition_name" -> L("Common"), "errdefs_msg_name" -> L("Traffic Statistics"),
          "traffic_stat_type" -> L(statType)) ++ counters)

    val cookieCounters = kvs(
      "cookie_challenge_issued" -> C("ci"), "cookie_challenge_passed" -> C("cp"),
      "cookie_flow_accepted" -> C("ca"), "cookie_flow_rejected" -> C("cr"))
    val flowCounter = kvs("traffic_stat_cnt" -> C("cnt"))

    val syWeird = hdr ++ bracket(kvs(
      "hostname" -> C("hostname"), "date_time" -> C("dt"),
      "dos_attack_id" -> C("base"), "dos_attack_event" -> L("Weird Event"),
      "severity" -> C("sev")))

    val cefAfmStart = afmHdrNamed ++ afmFixed ++ kvs(
      "F5RouteDomain" -> L("0"), "F5FlowID" -> C("flow"),
      "cs2" -> C("vlan"), "cs2Label" -> L("vlan"),
      "cs3" -> C("vs"), "cs3Label" -> L("virtual_name"),
      "cn3" -> C("aid_afm"), "cn3Label" -> L("attack_id"),
      "cs1" -> L("Attack Started"), "cs1Label" -> L("attack_status"))

    def cefAfmSample(withCtx: Boolean) = {
      val ctx = if (withCtx) kvs("cs3" -> C("vs"), "cs3Label" -> L("virtual_name")) else Vector.empty[Frag]
      afmHdrNamed ++ afmFixed ++ kvs(
        "cn1" -> C("recv"), "cn1Label" -> L("dos_packets_received"),
        "cn2" -> C("drops"), "cn2Label" -> L("dos_packets_dropped"),
        "cs2" -> C("vlan"), "cs2Label" -> L("vlan")) ++ ctx ++ kvs(
        "cn3" -> C("aid_afm1"), "cn3Label" -> L("attack_id"),
        "cs1" -> L("Attack Sampled"), "cs1Label" -> L("attack_status"))
    }

    val cefAfmSync = afmHdrNamed ++ afmFixed ++ kvs(
      "cn3" -> C("aid_afm1"), "cn3Label" -> L("attack_id"),
      "cs1" -> L("TCP Syncookie"), "cs1Label" -> L("attack_status"))

    val cefAfmDns =
      Vector(L("CEF:0|F5|Advanced Firewall Module|11.6.0|Network DoS Attack|DNS Event|"),
        C("sev"), L("|")) ++ afmFixed ++ kvs(
        "cn1" -> C("recv"), "cn1Label" -> L("dos_packets_received"),
        "cn2" -> C("drops"), "cn2Label" -> L("dos_packets_dropped"),
        "cs3" -> C("vs"), "cs3Label" -> L("virtual_name"),
        "cs4" -> C("aname"), "cs4Label" -> L("dos_attack_name"),
        "cs5" -> L("A"), "cs5Label" -> L("query_type"),
        "cs6" -> C("qn"), "cs6Label" -> L("query_name"),
        "cn3" -> C("aid_afm1"), "cn3Label" -> L("attack_id"),
        "cs1" -> L("Attack Sampled"), "cs1Label" -> L("attack_status"))

    // Stop keys FIRST (see Transcripts scaladoc / FIXTURES.md CEF-AFM-STOP):
    // an underscore key breaks the CEF lookahead of the preceding pair.
    val cefAfmStop = afmHdrNamed ++ Vector(L("date_time="), C("dt")) ++ kvs(
      "dos_attack_id" -> C("aid_afm1"), "zz" -> L("0")) ++ Vector(L(" ")) ++
      afmFixed ++ kvs(
      "cn3" -> C("aid_afm1"), "cn3Label" -> L("attack_id"),
      "cs1" -> L("Attack Stopped"), "cs1Label" -> L("attack_status"))

    Vector(
      Branch(0, None, None, syStart),
      Branch(1, None, None, sySample(withCtx = true)),
      Branch(2, None, None, sySample(withCtx = false)),
      Branch(3, None, None, syStop),
      Branch(4, None, None, sySync),
      Branch(5, None, None, syTraffic("Cryptographic SYN Cookie", cookieCounters)),
      Branch(6, None, None, syTraffic("Reaped Flow", flowCounter)),
      Branch(7, None, None, syTraffic("Active Flow", flowCounter)),
      Branch(8, None, None, syTraffic("Missed Flow", flowCounter)),
      Branch(9, None, None, syWeird),
      Branch(10, None, None, cefAfmStart),
      Branch(11, Some("k % 2 = 0"), Some(pmod(col("k"), lit(2)) === 0), cefAfmSample(withCtx = true)),
      Branch(11, Some("k % 2 <> 0"), Some(pmod(col("k"), lit(2)) =!= 0), cefAfmSample(withCtx = false)),
      Branch(12, Some("k % 2 = 0"), Some(pmod(col("k"), lit(2)) === 0), cefAfmSync),
      Branch(12, Some("k % 2 <> 0"), Some(pmod(col("k"), lit(2)) =!= 0), cefAfmDns),
      Branch(13, None, None, cefAfmStop),
      Branch(14, None, None, asmMsg("Attack started")),
      Branch(15, None, None, asmMsg("Mitigation stats")),
      Branch(16, None, None, asmMsg("Mitigation changed")),
      Branch(17, None, None, asmMsg("Attack ended")),
      Branch(18, None, None, Vector(L(Transcripts.HealthString))),
      Branch(19, Some("k % 3 = 0"), Some(pmod(col("k"), lit(3)) === 0),
        Vector(L("<133>"), C("dt"), L(" "), C("hostname"), L(" some other logline"))),
      Branch(19, Some("k % 3 = 1"), Some(pmod(col("k"), lit(3)) === 1),
        Vector(L("CEF:0|F5|ASM|11.6.0"))),
      Branch(19, Some("k % 3 = 2"), Some(pmod(col("k"), lit(3)) === 2),
        Vector(L("CEF:0|F5|ASM|11.6.0|Brute Force|Rate Limit|5|dvchost="), C("hostname"))))
  }

  /** Spark-side text column: chained when() over the branch table. */
  def textColumn: Column =
    branches.foldLeft(lit(null).cast("string")) { (acc, b) =>
      val cond = b.condCol match {
        case Some(extra) => col("s") === b.s && extra
        case None => col("s") === b.s
      }
      when(cond, render(b.spec)).otherwise(acc)
    }

  /** DuckDB-side text expression: CASE over the same branch table. */
  def textSql: String =
    branches.map { b =>
      val cond = b.condSql match {
        case Some(extra) => s"s = ${b.s} AND $extra"
        case None => s"s = ${b.s}"
      }
      s"WHEN $cond THEN ${renderSql(b.spec)}"
    }.mkString("CASE ", " ", " END")
}
