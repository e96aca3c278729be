package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F5Parse._
import graft.sources.Transcripts

/** The parse -> enrich -> normalize -> route -> aggregate pipeline over the
  * transcripts table.
  *
  * Reference dataflow being re-expressed (SURVEY.md §2/§3):
  * source -> health-filter (F1) -> format-dispatch (F2) -> one-pass KV scan
  * (P3/P4) -> per-family normalize (P6-P12, D1-D7) -> explode (E1) -> route
  * by record_type (S5) -> stateful attack-lifecycle correlate (W3).
  *
  * Each record family's normalization is a (column-name -> expression) list
  * shared by two consumers: the per-family DataFrames (one filtered select
  * each — what the Verify queries use) and the single-pass `records()`
  * assembly, which evaluates ONE table scan, builds one struct per matched
  * branch, explodes (the E1 generator), and resolves the W3 lifecycle with
  * a single window shuffle on attack_id. At 100 TB that shape is one narrow
  * pass over the data plus exactly one exchange before the sinks.
  */
object Pipeline {

  /** Routed family names (S5 sink axes) + the internal stop pseudo-family. */
  val Attacks = "attacks"
  val Stats = "attack_mitigation_stats"
  val Traffic = "traffic_stats"
  val Stop = "_stop"

  /** The externally-routed families (what records() emits). */
  val RecordFamilies: Set[String] = Set(Attacks, Stats, Traffic)

  /** Every family incl. the internal `_stop` rows (what Router stages). */
  val AllFamilies: Set[String] = RecordFamilies + Stop

  /** Spark-side session knobs the parse path relies on. Idempotent. */
  def configure(spark: SparkSession): Unit = {
    // Ruby's elsif chains are last-assignment-wins; map_from_entries must
    // dedup the same way rather than throw (bbn_syslog.rb:64-94 semantics).
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // The reference's Ruby hash probes return nil for absent keys and its
    // numeric coercions never raise; ANSI mode (Spark 4 default) would
    // instead throw on element_at misses and bad string->number casts.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // SQL surface for the custom expressions (kv_extract, ...)
    graft.plans.GraftExtensions.register(spark)
  }

  /** F1 health-string drop. The reference matches the socket peer against a
    * per-host dictionary with an "any" wildcard (bbn_f5networks.rb:205-229);
    * transcripts carry no transport host, and health-check payloads embed
    * none, so the wildcard semantics (every host shares the default string)
    * are what is reproducible here — a broadcast anti-join against the
    * distinct health strings.
    */
  def healthFilter(transcripts: DataFrame, health: DataFrame): DataFrame =
    transcripts.join(
      broadcast(health.select(col("health")).distinct()),
      transcripts("text") === col("health"), "left_anti")

  private def kvv(key: String): Column = element_at(col("kv"), key)
  private def dyn(key: String): Column = element_at(col("dyn"), key)

  /** Shared syslog base: quote-strip (P1), one-pass KV scan (P3), PRI
    * decomposition, J1 offset enrichment via broadcast join on the embedded
    * device IP (the transcript-world analog of the socket peer host).
    */
  def syslogBase(transcripts: DataFrame, offsets: DataFrame): DataFrame = {
    val msg = stripQuotes(col("text"))
    transcripts
      .filter(remoteLogFormat(col("text")) === "Syslog")
      .withColumn("msg", msg)
      .withColumn("kv", kvSyslog(col("msg")))
      .withColumn("_pri", pri(col("text")))
      .withColumn("facility", (col("_pri") / lit(8)).cast("int"))
      .withColumn("severity", pmod(col("_pri"), lit(8)))
      .withColumn("host", kvv("bigip_mgmt_ip"))
      .join(broadcast(offsets), Seq("host"), "left")
      .withColumn("offh", coalesce(col("utc_offset_h"), lit(0)))
      .withColumn("evt", kvv("dos_attack_event"))
      .withColumn("sy_utc", toUtcOrEmpty(kvv("date_time"), col("offh")))
  }

  /** CEF base: header split (P5), arity guard (F5), one-pass extension KV
    * scan (P4), dynamic-label pairing (P7), ASM attack-type guard (F4),
    * offset join on `dvc`.
    */
  def cefBase(transcripts: DataFrame, offsets: DataFrame): DataFrame = {
    val spl = split(col("text"), "\\|")
    transcripts
      .filter(remoteLogFormat(col("text")) === "CEF")
      .withColumn("spl", spl)
      .filter(size(col("spl")) === 8) // bbn_cef.rb:28-62
      .filter( // module dispatch + ASM attack-type guard (bbn_cef.rb:36-53)
        element_at(col("spl"), 3) === "Advanced Firewall Module" ||
          (element_at(col("spl"), 3) === "ASM" && element_at(col("spl"), 5) === "DOS L7 attack"))
      .withColumn("kv", kvCef(element_at(col("spl"), 8)))
      .withColumn("dyn", pairedLabels(col("kv")))
      .withColumn("facility", lit(null).cast("int"))
      .withColumn("severity", lit(null).cast("int"))
      .withColumn("host", kvv("dvc"))
      .join(broadcast(offsets), Seq("host"), "left")
      .withColumn("offh", coalesce(col("utc_offset_h"), lit(0)))
      .withColumn("astat", dyn("attack_status"))
      .withColumn("cef_utc", toUtcOrEmpty(kvv("rt"), col("offh")))
      .withColumn("cef_vn", dyn("virtual_name"))
      .withColumn("cef_vs", dyn("Virtual Server"))
  }

  // ---------------------------------------------------------------------
  // Family normalizations as shared (name -> column) lists
  // ---------------------------------------------------------------------

  private def common(fmt: String, payload: Column): Seq[(String, Column)] = Seq(
    "customer_id" -> lit(0),
    "record_type" -> lit("attacks"),
    "remote_log_format" -> lit(fmt),
    "remote_log_payload" -> payload,
    "device_utc_offset" -> col("offh"))

  /** syslog Attack Started -> attacks (bbn_syslog.rb:158-239). */
  private def colsSyslogStart: Seq[(String, Column)] = {
    val utc = col("sy_utc")
    common("Syslog", col("msg")) ++ Seq(
      "device_vendor" -> coalesce(kvv("device_vendor"), lit("")),
      "device_module" -> coalesce(kvv("device_product"), lit("")),
      "device_version" -> coalesce(kvv("device_version"), lit("")),
      "device_hostname" -> coalesce(kvv("hostname"), lit("")),
      "device_ip" -> coalesce(kvv("bigip_mgmt_ip"), lit("")),
      "device_utc_time" -> utc,
      "policy_name" -> lit(null).cast("string"),
      "virtual_context" -> coalesce(kvv("context_name"), lit("")),
      "virtual_routing_table" -> coalesce(kvv("route_domain"), lit("")),
      "administration_partition" -> coalesce(kvv("partition_name"), lit("")),
      "flow_table_id" -> flowTableId(kvv("flow_id")),
      "attack_mlp" -> lit(0),
      "attack_name" -> coalesce(kvv("dos_attack_name"), lit("")),
      "attack_id" -> coalesce(kvv("dos_attack_id").cast("long"), lit(0L)),
      "attack_type" -> lit(1),
      "attack_status" -> coalesce(kvv("dos_attack_event"), lit("")),
      "attack_severity" -> coalesce(kvv("severity").cast("int"), lit(0)),
      "attack_category" -> coalesce(kvv("errdefs_msg_name"), lit("")),
      "attack_event_counter" -> lit(null).cast("int"),
      "attack_ongoing" -> lit(1),
      "attack_mitigation_method" -> lit(null).cast("string"),
      "attack_mitigation_action" -> lit(null).cast("string"),
      "attack_start_date" -> utc,
      "attack_end_date" -> lit(null).cast("string"),
      "unknown_key_value_pair" -> lit(""))
  }

  /** syslog TCP Syncookie -> attacks (bbn_syslog.rb:327-411). Quirks
    * replicated: no dos_attack_id arm (attack_id stays 0), no all-zero
    * sentinel on flow_id, attack_status becomes the original action,
    * start==end date, ongoing=0.
    */
  private def colsSyslogSync: Seq[(String, Column)] = {
    val utc = col("sy_utc")
    common("Syslog", col("msg")) ++ Seq(
      "device_vendor" -> coalesce(kvv("device_vendor"), lit("")),
      "device_module" -> coalesce(kvv("device_product"), lit("")),
      "device_version" -> coalesce(kvv("device_version"), lit("")),
      "device_hostname" -> coalesce(kvv("hostname"), lit("")),
      "device_ip" -> coalesce(kvv("bigip_mgmt_ip"), lit("")),
      "device_utc_time" -> utc,
      "policy_name" -> lit(""),
      "virtual_context" -> coalesce(kvv("context_name"), lit("")),
      "virtual_routing_table" -> coalesce(kvv("route_domain"), lit("")),
      "administration_partition" -> coalesce(kvv("partition_name"), lit("")),
      "flow_table_id" -> coalesce(kvv("flow_id"), lit("")),
      "attack_mlp" -> lit(0),
      "attack_name" -> lit("TCP SYN flood"),
      "attack_id" -> lit(0L),
      "attack_type" -> lit(1),
      "attack_status" -> coalesce(kvv("action"), lit("")),
      "attack_severity" -> coalesce(kvv("severity").cast("int"), lit(0)),
      "attack_category" -> coalesce(kvv("errdefs_msg_name"), lit("")),
      "attack_event_counter" -> lit(0),
      "attack_ongoing" -> lit(0),
      "attack_mitigation_method" -> lit("Per Virtual Server SYN Cookie"),
      "attack_mitigation_action" -> lit("Cryptographic SYN Cookie"),
      "attack_start_date" -> utc,
      "attack_end_date" -> utc,
      "unknown_key_value_pair" -> lit(""))
  }

  /** CEF attacks: AFM Attack Started (bbn_cef.rb:282-366) / ASM Attack
    * started (bbn_cef.rb:662-785); `afm` switches the module-dependent arms.
    */
  private def colsCefStart(afm: Boolean): Seq[(String, Column)] = {
    val utc = col("cef_utc")
    val asmName = when(dyn("detection_mode") === "TPS Increased", "HTTP Flood")
      .when(dyn("detection_mode") === "Latency Increased", "HTTP Server Response Latency")
      .otherwise("")
    val vcSrc = if (afm) col("cef_vn") else col("cef_vs")
    val vc = coalesce(when(vcSrc =!= "", vcSrc), lit(""))
    common("CEF", col("text")) ++ Seq(
      "device_vendor" -> coalesce(element_at(col("spl"), 2), lit("")),
      "device_module" -> coalesce(element_at(col("spl"), 3), lit("")),
      "device_version" -> coalesce(element_at(col("spl"), 4), lit("")),
      "device_hostname" -> coalesce(kvv("dvchost"), lit("")),
      "device_ip" -> coalesce(kvv("dvc"), lit("")),
      "device_utc_time" -> utc,
      "policy_name" -> lit(null).cast("string"),
      "virtual_context" -> vc,
      "virtual_routing_table" -> (if (afm) coalesce(kvv("F5RouteDomain"), lit("")) else lit("")),
      "administration_partition" -> when(vc =!= "", adminPartition(vc)).otherwise(""),
      "flow_table_id" -> (if (afm) flowTableId(kvv("F5FlowID")) else lit("")),
      "attack_mlp" -> lit(0),
      "attack_name" -> (if (afm) element_at(col("spl"), 6) else asmName),
      "attack_id" -> coalesce(dyn("attack_id").cast("long"), lit(0L)),
      "attack_type" -> lit(1),
      "attack_status" -> coalesce(dyn("attack_status"), lit("")),
      "attack_severity" ->
        (if (afm) lit(0) else coalesce(element_at(col("spl"), 7).cast("int"), lit(0))),
      "attack_category" -> lit(if (afm) "Network DoS Event" else "Application DoS Event"),
      "attack_event_counter" -> lit(null).cast("int"),
      "attack_ongoing" -> lit(1),
      "attack_mitigation_method" -> lit(null).cast("string"),
      "attack_mitigation_action" -> lit(null).cast("string"),
      "attack_start_date" -> utc,
      "attack_end_date" -> lit(null).cast("string"),
      "unknown_key_value_pair" -> lit(""))
  }

  /** syslog Attack Sampled -> stats (bbn_syslog.rb:31-156). Quirks pinned:
    * attack_name never populated (D1 Flood/Sweep arms unreachable) and
    * attack_severity absent (null).
    */
  private def colsSyslogSample: Seq[(String, Column)] = {
    val hasCtx = kvv("context_name").isNotNull
    val cat = kvv("errdefs_msg_name")
    common("Syslog", col("msg")).map {
      case ("record_type", _) => "record_type" -> lit("attack_mitigation_stats")
      case other => other
    } ++ Seq(
      "device_utc_time" -> col("sy_utc"),
      "attack_id" -> coalesce(kvv("dos_attack_id").cast("long"), lit(0L)),
      "attack_type" -> lit(1),
      "attack_severity" -> lit(null).cast("int"),
      "attack_status" -> coalesce(kvv("dos_attack_event"), lit("")),
      "attack_detection_rate" -> coalesce(kvv("dos_packets_received").cast("int"), lit(0)),
      "attack_detection_matrix" -> rateMatrix(hasCtx, cat, "PPS"),
      "attack_detection_method" -> lit(null).cast("string"),
      "attack_drop_rate" -> coalesce(kvv("dos_packets_dropped").cast("int"), lit(0)),
      "attack_drop_matrix" -> rateMatrix(hasCtx, cat, "PPS"),
      "attack_mitigation_method" ->
        mitigationMethod(hasCtx, kvv("action"), cat, lit(null), lit("")),
      "attack_mitigation_action" -> coalesce(kvv("action"), lit("")),
      "attack_request_resource" -> lit(""),
      "attack_dns_query_name" -> coalesce(kvv("dns_query_name"), lit("")),
      "attack_dns_query_type" -> coalesce(kvv("dns_query_type"), lit("")),
      "attack_source_ip" -> coalesce(kvv("source_ip"), lit("")),
      "attack_source_port" -> coalesce(kvv("source_port"), lit("")),
      "attack_source_vlan" -> lit(""),
      "attack_destination_ip" -> coalesce(kvv("dest_ip"), lit("")),
      "attack_destination_port" -> coalesce(kvv("dest_port"), lit("")),
      "attack_destination_vlan" -> coalesce(kvv("vlan"), lit("")),
      "attack_start_date" -> lit(null).cast("string"))
  }

  /** CEF/AFM Attack Sampled -> stats (bbn_cef.rb:368-527) incl. DNS
    * recategorization (bbn_cef.rb:224-242). attack_name IS present here so
    * the Flood/Sweep D1 arms fire; severity is the hash default 0.
    */
  private def colsCefAfmSample: Seq[(String, Column)] = {
    val utc = col("cef_utc")
    val headerName = element_at(col("spl"), 6)
    val isDns = headerName === "DNS Event" && dyn("query_type").isNotNull
    val name = when(isDns, coalesce(dyn("dos_attack_name"), headerName)).otherwise(headerName)
    val cat = when(isDns, "DNS Event").otherwise("Network DoS Event")
    val vcRaw = when(dyn("virtual_name") =!= "", dyn("virtual_name"))
    val hasCtx = vcRaw.isNotNull
    common("CEF", col("text")).map {
      case ("record_type", _) => "record_type" -> lit("attack_mitigation_stats")
      case other => other
    } ++ Seq(
      "device_utc_time" -> utc,
      "attack_id" -> coalesce(dyn("attack_id").cast("long"), lit(0L)),
      "attack_type" -> lit(1),
      "attack_severity" -> lit(0), // AFM never fills it; hash default 0
      "attack_status" -> lit("Attack Sampled"),
      "attack_detection_rate" -> coalesce(dyn("dos_packets_received").cast("int"), lit(0)),
      "attack_detection_matrix" -> rateMatrix(hasCtx, cat, "PPS"),
      "attack_detection_method" -> lit(null).cast("string"),
      "attack_drop_rate" -> coalesce(dyn("dos_packets_dropped").cast("int"), lit(0)),
      "attack_drop_matrix" -> rateMatrix(hasCtx, cat, "PPS"),
      "attack_mitigation_method" -> mitigationMethod(hasCtx, kvv("act"), cat, name, lit("")),
      "attack_mitigation_action" -> coalesce(kvv("act"), lit("")),
      "attack_request_resource" -> lit(""),
      "attack_dns_query_name" -> coalesce(dyn("query_name"), lit("")),
      "attack_dns_query_type" -> coalesce(dyn("query_type"), lit("")),
      "attack_source_ip" -> coalesce(kvv("src"), lit("")),
      "attack_source_port" -> coalesce(kvv("spt"), lit("")),
      "attack_source_vlan" -> lit(""),
      "attack_destination_ip" -> coalesce(kvv("dst"), lit("")),
      "attack_destination_port" -> coalesce(kvv("dpt"), lit("")),
      "attack_destination_vlan" -> coalesce(dyn("vlan"), lit("")),
      "attack_start_date" -> lit(null).cast("string"))
  }

  /** CEF/ASM stats rows (bbn_cef.rb:662-913): Attack started's piggy-backed
    * sample (severity stays 0 — unreachable elsif at :741, no start_date),
    * Mitigation stats / Mitigation changed (severity set, start_date
    * stamped).
    */
  private def colsCefAsmStats: Seq[(String, Column)] = {
    val status = col("astat")
    val fromStart = status === "Attack started"
    val utc = col("cef_utc")
    common("CEF", col("text")).map {
      case ("record_type", _) => "record_type" -> lit("attack_mitigation_stats")
      case other => other
    } ++ Seq(
      "device_utc_time" -> utc,
      "attack_id" -> coalesce(dyn("attack_id").cast("long"), lit(0L)),
      "attack_type" -> lit(1),
      "attack_severity" -> when(fromStart, 0)
        .otherwise(coalesce(element_at(col("spl"), 7).cast("int"), lit(0))),
      "attack_status" -> when(fromStart, "Mitigation stats").otherwise(coalesce(status, lit(""))),
      "attack_detection_rate" -> coalesce(dyn("detection_average").cast("int"), lit(0)),
      "attack_detection_matrix" -> lit("TPS"),
      "attack_detection_method" -> coalesce(dyn("detection_mode"), lit("")),
      "attack_drop_rate" -> coalesce(dyn("dropped_requests").cast("int"), lit(0)),
      "attack_drop_matrix" -> lit("TPS"),
      "attack_mitigation_method" -> coalesce(element_at(col("spl"), 6), lit("")),
      "attack_mitigation_action" -> coalesce(kvv("act"), lit("")),
      "attack_request_resource" -> coalesce(kvv("request"), lit("")),
      "attack_dns_query_name" -> lit(null).cast("string"),
      "attack_dns_query_type" -> lit(null).cast("string"),
      "attack_source_ip" -> coalesce(kvv("src"), lit("")),
      "attack_source_port" -> lit(null).cast("string"),
      "attack_source_vlan" -> lit(null).cast("string"),
      "attack_destination_ip" -> lit(null).cast("string"),
      "attack_destination_port" -> lit(null).cast("string"),
      "attack_destination_vlan" -> lit(null).cast("string"),
      "attack_start_date" -> when(fromStart, lit(null).cast("string")).otherwise(utc))
  }

  /** syslog Traffic Statistics x 4 stat types (bbn_syslog.rb:420-662). */
  private def colsTraffic: Seq[(String, Column)] = {
    val statType = kvv("traffic_stat_type")
    val isCookie = statType === "Cryptographic SYN Cookie"
    Seq(
      "record_type" -> lit("traffic_stats"),
      "remote_log_format" -> lit("Syslog"),
      "remote_log_payload" -> col("msg"),
      "device_utc_offset" -> col("offh"),
      "device_utc_time" -> col("sy_utc"),
      "device_vendor" -> coalesce(kvv("device_vendor"), lit("")),
      "device_module" -> coalesce(kvv("device_product"), lit("")),
      "device_version" -> coalesce(kvv("device_version"), lit("")),
      "device_hostname" -> coalesce(kvv("hostname"), lit("")),
      "device_ip" -> coalesce(kvv("bigip_mgmt_ip"), lit("")),
      "virtual_context" -> coalesce(kvv("context_name"), lit("")),
      "administration_partition" -> coalesce(kvv("partition_name"), lit("")),
      "traffic_stat_type" -> coalesce(statType, lit("")),
      "traffic_stat_counter" ->
        when(!isCookie, coalesce(kvv("traffic_stat_cnt").cast("int"), lit(null))),
      "cookie_challenge_issued" -> when(isCookie, kvv("cookie_challenge_issued").cast("int")),
      "cookie_challenge_passed" -> when(isCookie, kvv("cookie_challenge_passed").cast("int")),
      "cookie_flow_accepted" -> when(isCookie, kvv("cookie_flow_accepted").cast("int")),
      "cookie_flow_rejected" -> when(isCookie, kvv("cookie_flow_rejected").cast("int")))
  }

  // ---------------------------------------------------------------------
  // Branch conditions (format dispatch + per-family guards)
  // ---------------------------------------------------------------------

  // `evt` is hoisted to a base column (syslogBase / parsedBase) so the five
  // branch dispatch probes share ONE map lookup per row instead of five
  // linear scans of the kv map (guide §4: eliminate duplicated expression
  // work in the hot path).
  private def evt: Column = col("evt")
  private def condSyStart: Column = evt === "Attack Started"
  private def condSySync: Column = evt === "TCP Syncookie"
  private def condSySample: Column = evt === "Attack Sampled"
  private def condSyStop: Column = evt === "Attack Stopped"
  private def condTraffic: Column =
    evt.isNull && kvv("errdefs_msg_name") === "Traffic Statistics" &&
      kvv("traffic_stat_type").isin(
        "Cryptographic SYN Cookie", "Reaped Flow", "Active Flow", "Missed Flow")
  private def isAfm: Column = element_at(col("spl"), 3) === "Advanced Firewall Module"
  private def isAsm: Column = element_at(col("spl"), 3) === "ASM"

  // ---------------------------------------------------------------------
  // Per-family DataFrames (used by the Verify queries)
  // ---------------------------------------------------------------------

  private def famSelect(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val keyed = Seq("conv_id" -> col("conv_id"), "turn_idx" -> col("turn_idx"), "ts" -> col("ts"))
    val tail = Seq("facility" -> col("facility"), "severity" -> col("severity"))
    df.select((keyed ++ cols ++ tail).map { case (n, c) => c.as(n) }: _*)
  }

  def syslogAttackStarts(syBase: DataFrame): DataFrame =
    famSelect(syBase.filter(condSyStart), colsSyslogStart)

  def syslogSyncookies(syBase: DataFrame): DataFrame =
    famSelect(syBase.filter(condSySync), colsSyslogSync)

  def cefAttackStarts(cef: DataFrame): DataFrame =
    famSelect(cef.filter(isAfm && dyn("attack_status") === "Attack Started"), colsCefStart(afm = true))
      .unionByName(
        famSelect(cef.filter(isAsm && dyn("attack_status") === "Attack started"), colsCefStart(afm = false)))

  def syslogSamples(syBase: DataFrame): DataFrame =
    famSelect(syBase.filter(condSySample), colsSyslogSample)

  def cefAfmSamples(cef: DataFrame): DataFrame =
    famSelect(cef.filter(isAfm && dyn("attack_status") === "Attack Sampled"), colsCefAfmSample)

  def cefAsmStats(cef: DataFrame): DataFrame =
    famSelect(cef.filter(isAsm && dyn("attack_status")
      .isin("Attack started", "Mitigation stats", "Mitigation changed")), colsCefAsmStats)

  def syslogTrafficStats(syBase: DataFrame): DataFrame =
    famSelect(syBase.filter(condTraffic), colsTraffic)

  // ---------------------------------------------------------------------
  // W3: attack-lifecycle correlation
  // ---------------------------------------------------------------------

  /** Stop/end events (zero-emission in the reference; they only mutate ES).
    * Three producers: syslog Attack Stopped (bbn_syslog.rb:242-324), CEF/AFM
    * Attack Stopped — which rescans the raw message with the SYSLOG regex
    * (bbn_cef.rb:530-614, the latent format mismatch replicated verbatim) —
    * and CEF/ASM Attack ended (bbn_cef.rb:915-993). attack_id 0 rows are
    * dropped (the `!= 0` guard before the ES round-trip).
    */
  def attackStops(syBase: DataFrame, cef: DataFrame): DataFrame = {
    val syStops = syBase
      .filter(condSyStop)
      .select(
        coalesce(kvv("dos_attack_id").cast("long"), lit(0L)).as("attack_id"),
        toUtcOrEmpty(kvv("date_time"), col("offh")).as("stop_utc"),
        col("ts"))
    val afmStops = cef
      .filter(isAfm && dyn("attack_status") === "Attack Stopped")
      .withColumn("sykv", kvSyslog(col("text")))
      .select(
        coalesce(element_at(col("sykv"), "dos_attack_id").cast("long"), lit(0L)).as("attack_id"),
        toUtcOrEmpty(element_at(col("sykv"), "date_time"), col("offh")).as("stop_utc"),
        col("ts"))
    val asmStops = cef
      .filter(isAsm && dyn("attack_status") === "Attack ended")
      .select(
        coalesce(dyn("attack_id").cast("long"), lit(0L)).as("attack_id"),
        toUtcOrEmpty(kvv("rt"), col("offh")).as("stop_utc"),
        col("ts"))
    syStops.unionByName(afmStops).unionByName(asmStops)
      .filter(col("attack_id") =!= 0L)
  }

  /** Batch MERGE replacement for the reference's per-stop synchronous ES
    * search+update: a stop closes its attack iff exactly ONE attacks row
    * carries that attack_id (hits.total==1 guard, bbn_syslog.rb:283-307);
    * orphan stops and ambiguous ids are log-only no-ops. The last stop in
    * stream order wins, matching sequential re-updates.
    */
  def correlate(attacks: DataFrame, stops: DataFrame): DataFrame = {
    val counts = attacks.groupBy("attack_id").agg(count("*").as("n_same_id"))
    val lastStop = stops.groupBy("attack_id")
      .agg(expr("max_by(stop_utc, ts)").as("stop_utc"))
    attacks
      .join(counts, Seq("attack_id"), "left")
      .join(lastStop, Seq("attack_id"), "left")
      .withColumn("closed", col("n_same_id") === 1 && col("stop_utc").isNotNull)
      .withColumn("attack_ongoing",
        when(col("closed"), 0).otherwise(col("attack_ongoing")))
      .withColumn("attack_end_date",
        when(col("closed"), col("stop_utc")).otherwise(col("attack_end_date")))
      .drop("n_same_id", "stop_utc", "closed")
  }

  def attacksAll(syBase: DataFrame, cef: DataFrame): DataFrame =
    syslogAttackStarts(syBase)
      .unionByName(syslogSyncookies(syBase))
      .unionByName(cefAttackStarts(cef))

  def statsAll(syBase: DataFrame, cef: DataFrame): DataFrame =
    syslogSamples(syBase)
      .unionByName(cefAfmSamples(cef))
      .unionByName(cefAsmStats(cef))

  // ---------------------------------------------------------------------
  // Single-pass assembly: E1 explode + S5 routing + W3 in one scan
  // ---------------------------------------------------------------------

  /** Superset record schema (name -> Spark SQL type) for the exploded
    * struct; every family fills a subset, the rest are typed nulls.
    */
  private val recSchema: Seq[(String, String)] = Seq(
    "customer_id" -> "int",
    "device_vendor" -> "string", "device_module" -> "string",
    "device_version" -> "string", "device_hostname" -> "string",
    "device_ip" -> "string", "device_utc_time" -> "string",
    "device_utc_offset" -> "int", "policy_name" -> "string",
    "virtual_context" -> "string", "virtual_routing_table" -> "string",
    "administration_partition" -> "string", "flow_table_id" -> "string",
    "attack_mlp" -> "int", "attack_name" -> "string", "attack_id" -> "bigint",
    "attack_type" -> "int", "attack_status" -> "string",
    "attack_severity" -> "int", "attack_category" -> "string",
    "attack_event_counter" -> "int", "attack_ongoing" -> "int",
    "attack_mitigation_method" -> "string", "attack_mitigation_action" -> "string",
    "attack_detection_rate" -> "int", "attack_detection_matrix" -> "string",
    "attack_detection_method" -> "string", "attack_drop_rate" -> "int",
    "attack_drop_matrix" -> "string", "attack_request_resource" -> "string",
    "attack_dns_query_name" -> "string", "attack_dns_query_type" -> "string",
    "attack_source_ip" -> "string", "attack_source_port" -> "string",
    "attack_source_vlan" -> "string", "attack_destination_ip" -> "string",
    "attack_destination_port" -> "string", "attack_destination_vlan" -> "string",
    "attack_start_date" -> "string", "attack_end_date" -> "string",
    "unknown_key_value_pair" -> "string",
    "traffic_stat_type" -> "string", "traffic_stat_counter" -> "int",
    "cookie_challenge_issued" -> "int", "cookie_challenge_passed" -> "int",
    "cookie_flow_accepted" -> "int", "cookie_flow_rejected" -> "int",
    "record_type" -> "string", "remote_log_format" -> "string",
    "remote_log_payload" -> "string")

  /** Schema-only surface for the reference's fourth ES mapping family,
    * `attack_mitigation_methods` (README.md:306-324): NO reference code
    * path ever emits a document of this type (verified across bbn_syslog.rb
    * and bbn_cef.rb — the family exists only in the index-setup curl), so
    * the engine carries the StructType for API completeness and emits
    * nothing, matching the reference's observable behavior exactly.
    */
  val attackMitigationMethodsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "customer_id int, device_utc_time string, device_utc_offset int, " +
        "attack_id bigint, attack_type string, attack_mitigation_method string, " +
        "attack_mitigation_action string, forward_for string, " +
        "forward_utc_time string, record_type string")

  /** Canonical (all-nullable) struct type for every branch: casting each
    * branch struct to the ONE shared type makes the 11 array elements'
    * types EXACTLY equal, so the analyzer's complex-type coercion
    * short-circuits on sameType instead of re-merging 11 x 50 fields that
    * differ only in null flags on every fixed-point iteration (JFR showed
    * TypeCoercionHelper.findTypeForComplex / regionMatchesCI as top driver
    * frames during route planning). Field types are unchanged, so the
    * per-field casts are identity at runtime.
    */
  private lazy val recStructType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(recSchema.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(t),
        nullable = true)
    })

  private def recStruct(cols: Seq[(String, Column)]): Column = {
    val m = cols.toMap
    struct(recSchema.map { case (n, t) =>
      m.getOrElse(n, lit(null).cast(t)).as(n)
    }: _*).cast(recStructType)
  }

  /** Internal stop pseudo-records for the single-pass W3 resolution
    * (record_type `_stop`, filtered out after correlation).
    */
  private def stopStruct(aid: Column, stopUtc: Column): Column = {
    val cols = Seq[(String, Column)](
      "record_type" -> lit("_stop"),
      "attack_id" -> coalesce(aid.cast("long"), lit(0L)),
      "device_utc_time" -> stopUtc)
    when(coalesce(aid.cast("long"), lit(0L)) =!= 0L, recStruct(cols))
  }

  /** Single-pass records: ONE scan of transcripts, conditional parse into a
    * format-appropriate kv map, one struct per matched branch (only the
    * REQUESTED families' branches are built — nested-field pruning cannot
    * reach through explode(array(struct...)), so an unrequested family's
    * ~50-column struct render is real per-row work Catalyst can't remove),
    * explode (the reference's 0..2-events-per-message E1), then the W3
    * lifecycle joined from a dedicated NARROW facts scan (`lifeFacts`) that
    * parses only the stop-relevant keys — the full-width struct render runs
    * exactly once per consumed family.
    */
  def records(spark: SparkSession, dir: String, rep: Int = 1,
              families: Set[String] = RecordFamilies,
              store: graft.sources.TranscriptTable = graft.sources.TranscriptStore): DataFrame = {
    configure(spark)
    val t = healthFilter(store.table(spark, dir, rep),
      Transcripts.healthStrings(spark))
    val offsets = Transcripts.utcOffsets(spark)
    val ex = explodedAll(t, offsets, families - Stop)
    if (families(Attacks)) applyLifecycle(ex, lifeAggOf(lifeFacts(t, offsets)))
    else ex
  }

  /** The shared parse base: format dispatch, quote strip, one-pass KV scan,
    * dynamic-label pairing, PRI decomposition, offset enrichment. Every
    * withColumn here is a lazy projection — consumers that never reference
    * `dyn` or `facility` pay nothing for them (column pruning).
    */
  private def parsedBase(t: DataFrame, offsets: DataFrame): DataFrame = {
    val fmt = remoteLogFormat(col("text"))
    val isSy = col("fmt") === "Syslog"
    // `spl` is CEF-only work: guard it so syslog rows (the majority) never
    // pay the regex split; element_at(null, i) stays null, so every
    // downstream probe sees exactly the out-of-bounds semantics it saw on a
    // 1-element split of a syslog line.
    val spl = when(col("fmt") === "CEF", split(col("text"), "\\|"))
    val cefOk = col("fmt") === "CEF" && size(col("spl")) === 8 &&
      (isAfm || (isAsm && element_at(col("spl"), 5) === "DOS L7 attack"))
    // Stages are batched with withColumns (one analysis pass per stage
    // instead of one per column): every Dataset transformation eagerly
    // re-analyzes the whole accumulated tree, and with the ~3000-node
    // branch expressions downstream the old 16-withColumn chain spent
    // ~0.5 s of single-threaded driver time PER records() CONSTRUCTION
    // (JFR: TypeCoercion/resolution frames) — paid inside every measured
    // query run and route. Stage boundaries follow the data dependencies.
    t
      .withColumn("fmt", fmt)
      .filter(col("fmt") =!= "Unknown")
      .withColumns(Map(
        "msg" -> when(col("fmt") === "Syslog", stripQuotes(col("text"))).otherwise(col("text")),
        "spl" -> spl,
        // one PRI regexp per row; facility/severity derive from the column
        // (identical values: null propagates through /8 and pmod)
        "_pri" -> when(isSy, pri(col("text")))))
      .withColumns(Map(
        "cef_ok" -> cefOk,
        "facility" -> (col("_pri") / lit(8)).cast("int"),
        "severity" -> pmod(col("_pri"), lit(8))))
      .withColumn("kv",
        when(isSy, kvSyslog(col("msg")))
          .when(col("cef_ok"), kvCef(element_at(col("spl"), 8))))
      .withColumns(Map(
        "dyn" -> when(col("cef_ok"), pairedLabels(col("kv"))),
        "host" -> when(isSy, kvv("bigip_mgmt_ip")).otherwise(kvv("dvc"))))
      .join(broadcast(offsets), Seq("host"), "left")
      .withColumn("offh", coalesce(col("utc_offset_h"), lit(0)))
      // Shared per-row subexpressions hoisted to named columns (guide §4):
      // the branch conditions and every family struct reference these as
      // plain attributes, so the datetime parse + hot map probes run ONCE
      // per row instead of once per referencing field — and the Generate's
      // expression tree (hence its generated code) shrinks accordingly.
      .withColumns(Map(
        "evt" -> kvv("dos_attack_event"),
        "astat" -> dyn("attack_status"),
        "sy_utc" -> toUtcOrEmpty(kvv("date_time"), col("offh")),
        "cef_utc" -> toUtcOrEmpty(kvv("rt"), col("offh")),
        "cef_vn" -> dyn("virtual_name"),
        "cef_vs" -> dyn("Virtual Server")))
      // The CEF/AFM stop quirk's syslog-regex rescan of the raw message
      // (bbn_cef.rb:541) is guarded to exactly the rows that need it and
      // computed once, not once per probed key.
      .withColumn("stop_sykv",
        when(col("cef_ok") && isAfm && col("astat") === "Attack Stopped",
          kvSyslog(col("text"))))
  }

  /** The 11 E1 branches in the reference's emission order, tagged by family
    * so consumers can prune. Order is load-bearing for the dual-emit turns
    * (ASM Attack started emits its start struct before its piggy-backed
    * stats struct, matching bbn_cef.rb:662-913's sequential pushes).
    */
  private def branchSpecs: Seq[(String, Column)] = {
    val isSy = col("fmt") === "Syslog"
    val afmStatus = col("astat")
    // CEF/AFM stop keys come from the SYSLOG-regex rescan of the raw message
    // (bbn_cef.rb:541), hoisted to the guarded `stop_sykv` base column so it
    // is computed once per matching row, not once per probed key.
    val afmStopKv = col("stop_sykv")
    Seq(
      Attacks -> when(isSy && condSyStart, recStruct(colsSyslogStart)),
      Attacks -> when(isSy && condSySync, recStruct(colsSyslogSync)),
      Stats -> when(isSy && condSySample, recStruct(colsSyslogSample)),
      Traffic -> when(isSy && condTraffic, recStruct(colsTraffic)),
      Stop -> when(isSy && condSyStop,
        stopStruct(kvv("dos_attack_id"), col("sy_utc"))),
      Attacks -> when(col("cef_ok") && isAfm && afmStatus === "Attack Started", recStruct(colsCefStart(afm = true))),
      Stats -> when(col("cef_ok") && isAfm && afmStatus === "Attack Sampled", recStruct(colsCefAfmSample)),
      Stop -> when(col("cef_ok") && isAfm && afmStatus === "Attack Stopped",
        stopStruct(element_at(afmStopKv, "dos_attack_id"),
          toUtcOrEmpty(element_at(afmStopKv, "date_time"), col("offh")))),
      Attacks -> when(col("cef_ok") && isAsm && afmStatus === "Attack started", recStruct(colsCefStart(afm = false))),
      Stats -> when(col("cef_ok") && isAsm && afmStatus.isin("Attack started", "Mitigation stats", "Mitigation changed"),
        recStruct(colsCefAsmStats)),
      Stop -> when(col("cef_ok") && isAsm && afmStatus === "Attack ended",
        stopStruct(dyn("attack_id"), col("cef_utc"))))
  }

  /** The stateless single-pass parse+explode over (health-filtered)
    * transcripts. `families` prunes the branch array to the requested
    * record families (default: everything incl. the internal `_stop`
    * pseudo-records) — a single-family consumer renders one family's
    * structs per row instead of all eleven. Shared by the batch path
    * (records), the routed write (Router) and Structured Streaming
    * (StreamingPipeline), which resolve the lifecycle differently.
    */
  def explodedAll(t: DataFrame, offsets: DataFrame,
                  families: Set[String] = AllFamilies): DataFrame = {
    val branches = array(branchSpecs.collect { case (f, c) if families(f) => c }: _*)
    parsedBase(t, offsets)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"), col("ts"),
        col("facility"), col("severity"),
        explode(filter(branches, b => b.isNotNull)).as("rec"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"), col("ts"),
        col("facility"), col("severity"), col("rec.*"))
  }

  /** W3 lifecycle facts from a DEDICATED narrow scan: one row per start or
    * stop event carrying only (attack_id, is_atk, ts, device_utc_time).
    * This is the cheap side of the lifecycle resolution — it re-scans the
    * source but renders NO record structs (the KV scan plus three probed
    * keys), so the full-width parse subtree runs once, not twice, per
    * records() consumer. Start facts carry no timestamp (only the stop
    * side's max matters); zero attack_ids never produce a fact (the
    * hits==1 guard's `!= 0` precondition, bbn_syslog.rb:283-307).
    */
  def lifeFacts(t: DataFrame, offsets: DataFrame): DataFrame = {
    val isSy = col("fmt") === "Syslog"
    val afmStatus = col("astat")
    val afmStopKv = col("stop_sykv")
    def fact(aid: Column, isAtk: Boolean, utc: Column): Column =
      when(coalesce(aid.cast("long"), lit(0L)) =!= 0L,
        struct(aid.cast("long").as("attack_id"), lit(isAtk).as("is_atk"),
          utc.as("device_utc_time")))
    val noUtc = lit(null).cast("string")
    val facts = array(
      when(isSy && condSyStart, fact(kvv("dos_attack_id"), isAtk = true, noUtc)),
      when(isSy && condSyStop,
        fact(kvv("dos_attack_id"), isAtk = false, col("sy_utc"))),
      when(col("cef_ok") && isAfm && afmStatus === "Attack Started",
        fact(dyn("attack_id"), isAtk = true, noUtc)),
      when(col("cef_ok") && isAfm && afmStatus === "Attack Stopped",
        fact(element_at(afmStopKv, "dos_attack_id"), isAtk = false,
          toUtcOrEmpty(element_at(afmStopKv, "date_time"), col("offh")))),
      when(col("cef_ok") && isAsm && afmStatus === "Attack started",
        fact(dyn("attack_id"), isAtk = true, noUtc)),
      when(col("cef_ok") && isAsm && afmStatus === "Attack ended",
        fact(dyn("attack_id"), isAtk = false, col("cef_utc"))))
    // Every fact branch requires the event/status value to be one of four
    // literal phrases, and each of those phrases appears VERBATIM in the raw
    // text of any row whose parsed kv/dyn value equals it (the KV scan only
    // extracts substrings of the message; the quote strip removes characters
    // around, never inside, these tokens — see Payloads' L(...) literals).
    // `contains` is therefore a sound SUPERSET prefilter: it can keep extra
    // rows (harmless — their branch conditions still fail) but can never
    // drop a fact row. It turns the second full-corpus KV parse into a
    // cheap substring scan plus a KV parse of only the start/stop rows
    // (guide §2.3: cut the expensive work before it runs, not after).
    val needles = Seq("Attack Started", "Attack Stopped", "Attack started", "Attack ended")
    val pre = t.filter(needles.map(col("text").contains(_)).reduce(_ || _))
    parsedBase(pre, offsets)
      .select(col("ts"), explode(filter(facts, b => b.isNotNull)).as("f"))
      .select(col("f.attack_id"), col("f.is_atk"), col("ts"), col("f.device_utc_time"))
  }

  /** Same facts, extracted from a staged routed read-back (Router/Lineage
    * phase 2): a column-pruned columnar read instead of a re-parse.
    */
  def lifeFactsFromStaged(back: DataFrame): DataFrame =
    back.filter(col("record_type").isin(Attacks, Stop) && col("attack_id") =!= 0L)
      .select(col("attack_id"), (col("record_type") === Attacks).as("is_atk"),
        col("ts"), col("device_utc_time"))

  /** Per-attack lifecycle aggregate over the narrow facts: start count (the
    * hits==1 guard) and last stop time in stream order (max_by ts — the
    * last synchronous ES re-update wins in the reference).
    */
  def lifeAggOf(facts: DataFrame): DataFrame =
    facts.groupBy("attack_id")
      .agg(
        sum(when(col("is_atk"), 1).otherwise(0)).as("_n_starts"),
        max(when(!col("is_atk"), struct(col("ts"), col("device_utc_time"))))
          .getField("device_utc_time").as("_stop_utc"))

  /** The lifecycle aggregate is per-EPISODE (one row per attack_id), orders
    * of magnitude smaller than the per-turn records side, so it is joined as
    * an explicit broadcast: the statically planned shape was a SortMergeJoin
    * whose Exchange carried all ~57 wide record columns (AQE could only
    * downgrade it to a local shuffle read AFTER paying the map-side shuffle
    * write of the wide rows). Broadcasting plans zero exchanges on the wide
    * side (guide §3.1). Scale knob: `spark.graft.lifecycle.broadcast`
    * (default true). On a cluster where distinct attack episodes outgrow a
    * broadcast relation (~10^8+ episodes / the 8 GB broadcast cap), set it
    * to false to fall back to the shuffled join — the cutover is episode
    * count, not corpus bytes, so 100 TB of turns with bounded episodes
    * stays on the broadcast path.
    */
  private def maybeBroadcast(lifeAgg: DataFrame): DataFrame =
    if (lifeAgg.sparkSession.conf.get("spark.graft.lifecycle.broadcast", "true").toBoolean)
      broadcast(lifeAgg)
    else lifeAgg

  /** Join the lifecycle aggregate back onto mixed-family records: a stop
    * closes its attack iff exactly ONE attacks row carries that attack_id
    * (hits.total==1, bbn_syslog.rb:283-307).
    *
    * Join shape: shuffled-HASH with the per-episode aggregate as the build
    * side (hint) instead of the old sort-merge — the ~57-column records side
    * still exchanges once but no longer SORTS (guide §3.1: prefer hash when
    * one side is small per partition; the build side is episodes, not
    * turns). The exchange is kept deliberately even though a broadcast
    * would be cheaper here: the declared q05/q11 queries end in a global
    * orderBy, and a range sort over an UNSTAGED map-only child evaluates
    * the whole parse twice (range-bound sampling pass + shuffle pass) — the
    * exchange is the materialization barrier that keeps the parse at one
    * pass. Router/Lineage/Streaming, which never global-sort above the
    * join, take the broadcast path (applyLifecycleToAttacks).
    */
  def applyLifecycle(records: DataFrame, lifeAgg: DataFrame): DataFrame = {
    val closed = col("record_type") === Attacks &&
      col("_n_starts") === 1 && col("_stop_utc").isNotNull
    val aggSide =
      if (records.sparkSession.conf
          .get("spark.graft.lifecycle.records.join", "broadcast") == "shuffle_hash")
        lifeAgg.hint("shuffle_hash")
      else maybeBroadcast(lifeAgg)
    records
      .join(aggSide, Seq("attack_id"), "left")
      .withColumn("attack_ongoing", when(closed, 0).otherwise(col("attack_ongoing")))
      .withColumn("attack_end_date",
        when(closed, col("_stop_utc")).otherwise(col("attack_end_date")))
      .drop("_n_starts", "_stop_utc")
  }

  /** applyLifecycle for an attacks-only frame (no record_type column —
    * Router/Lineage commit paths, where the family is the partition dir).
    */
  def applyLifecycleToAttacks(atk: DataFrame, lifeAgg: DataFrame): DataFrame = {
    val closed = col("_n_starts") === 1 && col("_stop_utc").isNotNull
    atk
      .join(maybeBroadcast(lifeAgg), Seq("attack_id"), "left")
      .withColumn("attack_ongoing", when(closed, 0).otherwise(col("attack_ongoing")))
      .withColumn("attack_end_date",
        when(closed, col("_stop_utc")).otherwise(col("attack_end_date")))
      .drop("_n_starts", "_stop_utc")
  }

  // ---------------------------------------------------------------------
  // Entry points
  // ---------------------------------------------------------------------

  /** Post-health transcripts (the pipeline's working set). Every entry
    * point takes the `store` seam (TranscriptTable) so an Iceberg-backed
    * table is a parameter on the QUERY surface too, not only on the routed
    * path (Router/Lineage) — VERDICT r4 item 4.
    */
  def transcriptsClean(spark: SparkSession, dir: String, rep: Int = 1,
                       store: graft.sources.TranscriptTable = graft.sources.TranscriptStore): DataFrame = {
    configure(spark)
    healthFilter(store.table(spark, dir, rep), Transcripts.healthStrings(spark))
  }

  /** The PRODUCTION variant of q01's deterministic dump: conversations
    * hash-partitioned by conv_id with each partition locally sorted on
    * (conv_id, turn_idx). Downstream consumers need per-CONVERSATION order
    * (a conversation's turns contiguous and ordered), not a global total
    * order — so the plan is one hash exchange + a LOCAL sort, never the
    * range exchange + full sort a global orderBy costs over the text
    * corpus at 10^12 turns (sampling pass + skew-prone range partitions).
    * Merge contract: a reader wanting a single totally-ordered stream
    * merges the already-sorted partitions by (conv_id, turn_idx) — a
    * streaming k-way merge, never a re-sort. Plan-pinned in PlanShapeSpec.
    */
  def transcriptsClustered(spark: SparkSession, dir: String, rep: Int = 1,
                           store: graft.sources.TranscriptTable = graft.sources.TranscriptStore): DataFrame = {
    configure(spark)
    store.table(spark, dir, rep)
      .repartition(col("conv_id"))
      .sortWithinPartitions("conv_id", "turn_idx")
  }

  /** (syslog base, CEF base) pair over the cleaned transcripts. */
  def bases(spark: SparkSession, dir: String, rep: Int = 1,
            store: graft.sources.TranscriptTable = graft.sources.TranscriptStore): (DataFrame, DataFrame) = {
    val t = transcriptsClean(spark, dir, rep, store)
    val offsets = Transcripts.utcOffsets(spark)
    (syslogBase(t, offsets), cefBase(t, offsets))
  }

  /** Correlated attacks via the family-pruned records() path: one scan of
    * transcripts renders ONLY the four attack branches (F5Parse structs for
    * stats/traffic are never built), the narrow lifeFacts scan resolves W3,
    * and this projects the attacks family's exact column set back out.
    * Identical rows to the per-branch correlate(attacksAll, attackStops)
    * shape (same family column lists feed recStruct and famSelect), pinned
    * by the q05/q11 oracle.
    */
  def attacksCorrelated(spark: SparkSession, dir: String, rep: Int = 1,
                        store: graft.sources.TranscriptTable = graft.sources.TranscriptStore): DataFrame =
    records(spark, dir, rep, families = Set(Attacks), store = store)
      .select(famNames(colsSyslogStart).map(col): _*)

  private def famNames(cols: Seq[(String, Column)]): Seq[String] =
    Seq("conv_id", "turn_idx", "ts") ++ cols.map(_._1) ++ Seq("facility", "severity")

  /** Stats / traffic families off the family-pruned explode in ONE pass:
    * these families never receive the W3 lifecycle rewrite, so they skip
    * both the lifecycle join and every other family's branch structs.
    * Identical rows to the per-branch statsAll/syslogTrafficStats unions
    * (the same column lists feed recStruct and famSelect), pinned by the
    * q06/q07 oracles.
    */
  def statsRecords(spark: SparkSession, dir: String, rep: Int = 1,
                   store: graft.sources.TranscriptTable = graft.sources.TranscriptStore): DataFrame =
    familyRecords(spark, dir, rep, Stats, colsSyslogSample, store)

  def trafficRecords(spark: SparkSession, dir: String, rep: Int = 1,
                     store: graft.sources.TranscriptTable = graft.sources.TranscriptStore): DataFrame =
    familyRecords(spark, dir, rep, Traffic, colsTraffic, store)

  private def familyRecords(spark: SparkSession, dir: String, rep: Int,
                            family: String, cols: Seq[(String, Column)],
                            store: graft.sources.TranscriptTable): DataFrame =
    records(spark, dir, rep, families = Set(family), store = store)
      .select(famNames(cols).map(col): _*)

  /** Downstream rollup (attacks x their mitigation-stat samples) in ONE
    * scan: both families come out of a single family-pruned explode, the
    * per-attack stat aggregates are window functions over attack_id on a
    * six-column projection (the wide payload never shuffles), and the
    * attacks rows filter back out carrying their aggregates — exactly the
    * left-join result of the old two-scan shape without the second parse.
    * The skew ceiling is the largest single attack episode (samples per
    * attack_id), which is bounded by the device's sampling cadence.
    */
  def attackRollup(spark: SparkSession, dir: String, rep: Int = 1,
                   store: graft.sources.TranscriptTable = graft.sources.TranscriptStore): DataFrame = {
    configure(spark)
    val t = healthFilter(store.table(spark, dir, rep),
      Transcripts.healthStrings(spark))
    val ex = explodedAll(t, Transcripts.utcOffsets(spark), Set(Attacks, Stats))
    val isAtk = col("record_type") === Attacks
    val w = Window.partitionBy("attack_id")
    ex.filter(col("attack_id") =!= 0L)
      .select(col("attack_id"), isAtk.as("is_atk"),
        col("attack_name"), col("attack_category"),
        col("attack_drop_rate"), col("attack_detection_rate"))
      .withColumn("n_samples", sum(when(!col("is_atk"), lit(1L))).over(w))
      .withColumn("total_drop",
        sum(when(!col("is_atk"), col("attack_drop_rate").cast("long"))).over(w))
      .withColumn("peak_detection",
        max(when(!col("is_atk"), col("attack_detection_rate"))).over(w))
      .filter(col("is_atk"))
      .select("attack_id", "attack_name", "attack_category",
        "n_samples", "total_drop", "peak_detection")
  }

  /** S7 reject side-output: turns that parse to nothing and are not
    * intentional zero-emitters (stops, CEF syncookie) — the auditable
    * replacement for the reference's file-logger diagnostics
    * (bbn_common.rb:18-49, bbn_syslog.rb:413-417, bbn_cef.rb:42-62).
    * Pure map-side classification; no join against the routed output.
    *
    * Deliberately its OWN scan rather than a branch of parsedBase: the
    * classifier needs only the format probe + one KV pass (a fraction of
    * the full parse), runs on a different cadence than routing (audit
    * jobs), and sharing parsedBase would widen every records() plan with
    * reject columns it always prunes. At 100 TB the right fusion is
    * operational, not planned: route once (Router stages everything) and
    * point this classifier at the same staged scan.
    */
  def rejects(spark: SparkSession, dir: String, rep: Int = 1,
              store: graft.sources.TranscriptTable = graft.sources.TranscriptStore): DataFrame = {
    val t = transcriptsClean(spark, dir, rep, store)
    val fmt = remoteLogFormat(col("text"))
    val spl = split(col("text"), "\\|")
    val kv = kvSyslog(stripQuotes(col("text")))
    val evt = element_at(kv, "dos_attack_event")
    val reason = when(fmt === "Unknown", "unknown_format")
      .when(fmt === "CEF" && size(spl) =!= 8, "cef_bad_arity")
      .when(fmt === "CEF" && element_at(spl, 3) === "ASM" &&
        element_at(spl, 5) =!= "DOS L7 attack", "cef_unsupported_attack_type")
      .when(fmt === "CEF" && !element_at(spl, 3).isin("ASM", "Advanced Firewall Module"),
        "cef_unknown_module")
      .when(fmt === "Syslog" && evt.isNotNull &&
        !evt.isin("Attack Sampled", "Attack Started", "Attack Stopped", "TCP Syncookie"),
        "unknown_dos_event")
      .when(fmt === "Syslog" && evt.isNull &&
        element_at(kv, "errdefs_msg_name") === "Traffic Statistics" &&
        !element_at(kv, "traffic_stat_type").isin(
          "Cryptographic SYN Cookie", "Reaped Flow", "Active Flow", "Missed Flow"),
        "unknown_traffic_stat_type")
      .when(fmt === "Syslog" && evt.isNull &&
        (element_at(kv, "errdefs_msg_name").isNull ||
          element_at(kv, "errdefs_msg_name") =!= "Traffic Statistics"),
        "unknown_syslog_message")
    t.withColumn("reject_reason", reason)
      .filter(col("reject_reason").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("reject_reason"))
  }
}
