package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.F5Parse._
import graft.sources.Transcripts

/** The parse -> enrich -> normalize -> route -> aggregate pipeline over the
  * transcripts table, as narrow (map-only) Catalyst plans: the only
  * shuffles are the final aggregates and the W3 lifecycle correlation.
  *
  * Reference dataflow being re-expressed (SURVEY.md §2/§3):
  * source -> health-filter (F1) -> format-dispatch (F2) -> one-pass KV scan
  * (P3/P4) -> per-family normalize (P6-P12, D1-D7) -> explode (E1) -> route
  * by record_type (S5) -> stateful attack-lifecycle correlate (W3).
  */
object Pipeline {

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
      .withColumn("facility", priFacility(col("text")))
      .withColumn("severity", priSeverity(col("text")))
      .withColumn("host", kvv("bigip_mgmt_ip"))
      .join(broadcast(offsets), Seq("host"), "left")
      .withColumn("offh", coalesce(col("utc_offset_h"), lit(0)))
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
      .withColumn("cef_vendor", element_at(col("spl"), 2))
      .withColumn("cef_module", element_at(col("spl"), 3))
      .withColumn("cef_version", element_at(col("spl"), 4))
      .filter( // module dispatch + ASM attack-type guard (bbn_cef.rb:36-53)
        col("cef_module") === "Advanced Firewall Module" ||
          (col("cef_module") === "ASM" && element_at(col("spl"), 5) === "DOS L7 attack"))
      .withColumn("kv", kvCef(element_at(col("spl"), 8)))
      .withColumn("dyn", pairedLabels(col("kv")))
      .withColumn("facility", lit(null).cast("int"))
      .withColumn("severity", lit(null).cast("int"))
      .withColumn("host", kvv("dvc"))
      .join(broadcast(offsets), Seq("host"), "left")
      .withColumn("offh", coalesce(col("utc_offset_h"), lit(0)))
  }

  // ---------------------------------------------------------------------
  // attacks family (README.md:260-304)
  // ---------------------------------------------------------------------

  /** syslog Attack Started -> attacks rows (bbn_syslog.rb:158-239). */
  def syslogAttackStarts(syBase: DataFrame): DataFrame = {
    val utc = toUtcOrEmpty(kvv("date_time"), col("offh"))
    syBase
      .filter(kvv("dos_attack_event") === "Attack Started")
      .select(
        col("conv_id"), col("turn_idx"), col("ts"),
        lit(0).as("customer_id"),
        coalesce(kvv("device_vendor"), lit("")).as("device_vendor"),
        coalesce(kvv("device_product"), lit("")).as("device_module"),
        coalesce(kvv("device_version"), lit("")).as("device_version"),
        coalesce(kvv("hostname"), lit("")).as("device_hostname"),
        coalesce(kvv("bigip_mgmt_ip"), lit("")).as("device_ip"),
        utc.as("device_utc_time"),
        col("offh").as("device_utc_offset"),
        lit(null).cast("string").as("policy_name"),
        coalesce(kvv("context_name"), lit("")).as("virtual_context"),
        coalesce(kvv("route_domain"), lit("")).as("virtual_routing_table"),
        coalesce(kvv("partition_name"), lit("")).as("administration_partition"),
        flowTableId(kvv("flow_id")).as("flow_table_id"),
        lit(0).as("attack_mlp"),
        coalesce(kvv("dos_attack_name"), lit("")).as("attack_name"),
        coalesce(kvv("dos_attack_id").cast("long"), lit(0L)).as("attack_id"),
        lit(1).as("attack_type"),
        coalesce(kvv("dos_attack_event"), lit("")).as("attack_status"),
        coalesce(kvv("severity").cast("int"), lit(0)).as("attack_severity"),
        coalesce(kvv("errdefs_msg_name"), lit("")).as("attack_category"),
        lit(null).cast("int").as("attack_event_counter"),
        lit(1).as("attack_ongoing"),
        lit(null).cast("string").as("attack_mitigation_method"),
        lit(null).cast("string").as("attack_mitigation_action"),
        utc.as("attack_start_date"),
        lit(null).cast("string").as("attack_end_date"),
        lit("").as("unknown_key_value_pair"),
        lit("attacks").as("record_type"),
        lit("Syslog").as("remote_log_format"),
        col("msg").as("remote_log_payload"),
        col("facility"), col("severity"))
  }

  /** syslog TCP Syncookie -> attacks rows (bbn_syslog.rb:327-411).
    * Reference quirks replicated: no dos_attack_id arm (attack_id stays 0),
    * no all-zero sentinel on flow_id, attack_status becomes the original
    * action, start==end date, ongoing=0.
    */
  def syslogSyncookies(syBase: DataFrame): DataFrame = {
    val utc = toUtcOrEmpty(kvv("date_time"), col("offh"))
    syBase
      .filter(kvv("dos_attack_event") === "TCP Syncookie")
      .select(
        col("conv_id"), col("turn_idx"), col("ts"),
        lit(0).as("customer_id"),
        coalesce(kvv("device_vendor"), lit("")).as("device_vendor"),
        coalesce(kvv("device_product"), lit("")).as("device_module"),
        coalesce(kvv("device_version"), lit("")).as("device_version"),
        coalesce(kvv("hostname"), lit("")).as("device_hostname"),
        coalesce(kvv("bigip_mgmt_ip"), lit("")).as("device_ip"),
        utc.as("device_utc_time"),
        col("offh").as("device_utc_offset"),
        lit("").as("policy_name"),
        coalesce(kvv("context_name"), lit("")).as("virtual_context"),
        coalesce(kvv("route_domain"), lit("")).as("virtual_routing_table"),
        coalesce(kvv("partition_name"), lit("")).as("administration_partition"),
        coalesce(kvv("flow_id"), lit("")).as("flow_table_id"),
        lit(0).as("attack_mlp"),
        lit("TCP SYN flood").as("attack_name"),
        lit(0L).as("attack_id"),
        lit(1).as("attack_type"),
        coalesce(kvv("action"), lit("")).as("attack_status"),
        coalesce(kvv("severity").cast("int"), lit(0)).as("attack_severity"),
        coalesce(kvv("errdefs_msg_name"), lit("")).as("attack_category"),
        lit(0).as("attack_event_counter"),
        lit(0).as("attack_ongoing"),
        lit("Per Virtual Server SYN Cookie").as("attack_mitigation_method"),
        lit("Cryptographic SYN Cookie").as("attack_mitigation_action"),
        utc.as("attack_start_date"),
        utc.as("attack_end_date"),
        lit("").as("unknown_key_value_pair"),
        lit("attacks").as("record_type"),
        lit("Syslog").as("remote_log_format"),
        col("msg").as("remote_log_payload"),
        col("facility"), col("severity"))
  }

  /** CEF attacks rows: AFM Attack Started (bbn_cef.rb:282-366) and ASM
    * Attack started (bbn_cef.rb:662-785).
    */
  def cefAttackStarts(cef: DataFrame): DataFrame = {
    val afm = col("cef_module") === "Advanced Firewall Module"
    val utc = toUtcOrEmpty(kvv("rt"), col("offh"))
    val status = dyn("attack_status")
    // ASM attack_name via D4 detection-mode table (bbn_cef.rb:651-660);
    // AFM name from header pos 5 (no DNS recat on starts: needs query_type).
    val asmName = when(dyn("detection_mode") === "TPS Increased", "HTTP Flood")
      .when(dyn("detection_mode") === "Latency Increased", "HTTP Server Response Latency")
      .otherwise("")
    val vc = when(afm, coalesce(when(dyn("virtual_name") =!= "", dyn("virtual_name")), lit("")))
      .otherwise(coalesce(when(dyn("Virtual Server") =!= "", dyn("Virtual Server")), lit("")))
    cef
      .filter((afm && status === "Attack Started") || (!afm && status === "Attack started"))
      .select(
        col("conv_id"), col("turn_idx"), col("ts"),
        lit(0).as("customer_id"),
        coalesce(col("cef_vendor"), lit("")).as("device_vendor"),
        coalesce(col("cef_module"), lit("")).as("device_module"),
        coalesce(col("cef_version"), lit("")).as("device_version"),
        coalesce(kvv("dvchost"), lit("")).as("device_hostname"),
        coalesce(kvv("dvc"), lit("")).as("device_ip"),
        utc.as("device_utc_time"),
        col("offh").as("device_utc_offset"),
        lit(null).cast("string").as("policy_name"),
        vc.as("virtual_context"),
        when(afm, coalesce(kvv("F5RouteDomain"), lit(""))).otherwise("").as("virtual_routing_table"),
        when(vc =!= "", adminPartition(vc)).otherwise("").as("administration_partition"),
        when(afm, flowTableId(kvv("F5FlowID"))).otherwise("").as("flow_table_id"),
        lit(0).as("attack_mlp"),
        when(afm, element_at(col("spl"), 6)).otherwise(asmName).as("attack_name"),
        coalesce(dyn("attack_id").cast("long"), lit(0L)).as("attack_id"),
        lit(1).as("attack_type"),
        coalesce(status, lit("")).as("attack_status"),
        when(afm, 0).otherwise(coalesce(element_at(col("spl"), 7).cast("int"), lit(0)))
          .as("attack_severity"),
        when(afm, "Network DoS Event").otherwise("Application DoS Event").as("attack_category"),
        lit(null).cast("int").as("attack_event_counter"),
        lit(1).as("attack_ongoing"),
        lit(null).cast("string").as("attack_mitigation_method"),
        lit(null).cast("string").as("attack_mitigation_action"),
        utc.as("attack_start_date"),
        lit(null).cast("string").as("attack_end_date"),
        lit("").as("unknown_key_value_pair"),
        lit("attacks").as("record_type"),
        lit("CEF").as("remote_log_format"),
        col("text").as("remote_log_payload"),
        col("facility"), col("severity"))
  }

  // ---------------------------------------------------------------------
  // attack_mitigation_stats family (README.md:326-362)
  // ---------------------------------------------------------------------

  /** syslog Attack Sampled -> stats rows (bbn_syslog.rb:31-156). Quirk
    * pinned: attack_name is never populated in this branch, so the D1
    * Flood/Sweep arms are unreachable and attack_severity is absent (null).
    */
  def syslogSamples(syBase: DataFrame): DataFrame = {
    val hasCtx = kvv("context_name").isNotNull
    val cat = kvv("errdefs_msg_name")
    syBase
      .filter(kvv("dos_attack_event") === "Attack Sampled")
      .select(
        col("conv_id"), col("turn_idx"), col("ts"),
        lit(0).as("customer_id"),
        toUtcOrEmpty(kvv("date_time"), col("offh")).as("device_utc_time"),
        col("offh").as("device_utc_offset"),
        coalesce(kvv("dos_attack_id").cast("long"), lit(0L)).as("attack_id"),
        lit(1).as("attack_type"),
        lit(null).cast("int").as("attack_severity"),
        coalesce(kvv("dos_attack_event"), lit("")).as("attack_status"),
        coalesce(kvv("dos_packets_received").cast("int"), lit(0)).as("attack_detection_rate"),
        rateMatrix(hasCtx, cat, "PPS").as("attack_detection_matrix"),
        lit(null).cast("string").as("attack_detection_method"),
        coalesce(kvv("dos_packets_dropped").cast("int"), lit(0)).as("attack_drop_rate"),
        rateMatrix(hasCtx, cat, "PPS").as("attack_drop_matrix"),
        mitigationMethod(hasCtx, kvv("action"), cat, lit(null), lit(""))
          .as("attack_mitigation_method"),
        coalesce(kvv("action"), lit("")).as("attack_mitigation_action"),
        lit("").as("attack_request_resource"),
        coalesce(kvv("dns_query_name"), lit("")).as("attack_dns_query_name"),
        coalesce(kvv("dns_query_type"), lit("")).as("attack_dns_query_type"),
        coalesce(kvv("source_ip"), lit("")).as("attack_source_ip"),
        coalesce(kvv("source_port"), lit("")).as("attack_source_port"),
        lit("").as("attack_source_vlan"),
        coalesce(kvv("dest_ip"), lit("")).as("attack_destination_ip"),
        coalesce(kvv("dest_port"), lit("")).as("attack_destination_port"),
        coalesce(kvv("vlan"), lit("")).as("attack_destination_vlan"),
        lit(null).cast("string").as("attack_start_date"),
        lit("attack_mitigation_stats").as("record_type"),
        lit("Syslog").as("remote_log_format"),
        col("msg").as("remote_log_payload"),
        col("facility"), col("severity"))
  }

  /** CEF/AFM Attack Sampled -> stats rows (bbn_cef.rb:368-527), including
    * the DNS recategorization (bbn_cef.rb:224-242). Unlike the syslog
    * branch, attack_name IS present here so the Flood/Sweep D1 arms fire.
    */
  def cefAfmSamples(cef: DataFrame): DataFrame = {
    val afm = col("cef_module") === "Advanced Firewall Module"
    val utc = toUtcOrEmpty(kvv("rt"), col("offh"))
    val headerName = element_at(col("spl"), 6)
    val isDns = headerName === "DNS Event" && dyn("query_type").isNotNull
    val name = when(isDns, coalesce(dyn("dos_attack_name"), headerName)).otherwise(headerName)
    val cat = when(isDns, "DNS Event").otherwise("Network DoS Event")
    val vcRaw = when(dyn("virtual_name") =!= "", dyn("virtual_name"))
    val hasCtx = vcRaw.isNotNull
    val act = kvv("act")
    cef
      .filter(afm && dyn("attack_status") === "Attack Sampled")
      .select(
        col("conv_id"), col("turn_idx"), col("ts"),
        lit(0).as("customer_id"),
        utc.as("device_utc_time"),
        col("offh").as("device_utc_offset"),
        coalesce(dyn("attack_id").cast("long"), lit(0L)).as("attack_id"),
        lit(1).as("attack_type"),
        lit(0).as("attack_severity"), // AFM never fills it; hash default 0
        lit("Attack Sampled").as("attack_status"),
        coalesce(dyn("dos_packets_received").cast("int"), lit(0)).as("attack_detection_rate"),
        rateMatrix(hasCtx, cat, "PPS").as("attack_detection_matrix"),
        lit(null).cast("string").as("attack_detection_method"),
        coalesce(dyn("dos_packets_dropped").cast("int"), lit(0)).as("attack_drop_rate"),
        rateMatrix(hasCtx, cat, "PPS").as("attack_drop_matrix"),
        mitigationMethod(hasCtx, act, cat, name, lit(""))
          .as("attack_mitigation_method"),
        coalesce(act, lit("")).as("attack_mitigation_action"),
        lit("").as("attack_request_resource"),
        coalesce(dyn("query_name"), lit("")).as("attack_dns_query_name"),
        coalesce(dyn("query_type"), lit("")).as("attack_dns_query_type"),
        coalesce(kvv("src"), lit("")).as("attack_source_ip"),
        coalesce(kvv("spt"), lit("")).as("attack_source_port"),
        lit("").as("attack_source_vlan"),
        coalesce(kvv("dst"), lit("")).as("attack_destination_ip"),
        coalesce(kvv("dpt"), lit("")).as("attack_destination_port"),
        coalesce(dyn("vlan"), lit("")).as("attack_destination_vlan"),
        lit(null).cast("string").as("attack_start_date"),
        lit("attack_mitigation_stats").as("record_type"),
        lit("CEF").as("remote_log_format"),
        col("text").as("remote_log_payload"),
        col("facility"), col("severity"))
  }

  /** CEF/ASM stats rows, from three branches (bbn_cef.rb:662-913):
    * Attack started (start-derived sample: severity stays default 0 due to
    * the unreachable elsif arm at bbn_cef.rb:741, device time copied from
    * the start, no attack_start_date), Mitigation stats and Mitigation
    * changed (severity populated, attack_start_date stamped).
    */
  def cefAsmStats(cef: DataFrame): DataFrame = {
    val asm = col("cef_module") === "ASM"
    val status = dyn("attack_status")
    val fromStart = status === "Attack started"
    val utc = toUtcOrEmpty(kvv("rt"), col("offh"))
    cef
      .filter(asm && status.isin("Attack started", "Mitigation stats", "Mitigation changed"))
      .select(
        col("conv_id"), col("turn_idx"), col("ts"),
        lit(0).as("customer_id"),
        utc.as("device_utc_time"),
        col("offh").as("device_utc_offset"),
        coalesce(dyn("attack_id").cast("long"), lit(0L)).as("attack_id"),
        lit(1).as("attack_type"),
        when(fromStart, 0)
          .otherwise(coalesce(element_at(col("spl"), 7).cast("int"), lit(0)))
          .as("attack_severity"),
        when(fromStart, "Mitigation stats").otherwise(coalesce(status, lit("")))
          .as("attack_status"),
        coalesce(dyn("detection_average").cast("int"), lit(0)).as("attack_detection_rate"),
        lit("TPS").as("attack_detection_matrix"),
        coalesce(dyn("detection_mode"), lit("")).as("attack_detection_method"),
        coalesce(dyn("dropped_requests").cast("int"), lit(0)).as("attack_drop_rate"),
        lit("TPS").as("attack_drop_matrix"),
        coalesce(element_at(col("spl"), 6), lit("")).as("attack_mitigation_method"),
        coalesce(kvv("act"), lit("")).as("attack_mitigation_action"),
        coalesce(kvv("request"), lit("")).as("attack_request_resource"),
        lit(null).cast("string").as("attack_dns_query_name"),
        lit(null).cast("string").as("attack_dns_query_type"),
        coalesce(kvv("src"), lit("")).as("attack_source_ip"),
        lit(null).cast("string").as("attack_source_port"),
        lit(null).cast("string").as("attack_source_vlan"),
        lit(null).cast("string").as("attack_destination_ip"),
        lit(null).cast("string").as("attack_destination_port"),
        lit(null).cast("string").as("attack_destination_vlan"),
        when(fromStart, lit(null).cast("string")).otherwise(utc).as("attack_start_date"),
        lit("attack_mitigation_stats").as("record_type"),
        lit("CEF").as("remote_log_format"),
        col("text").as("remote_log_payload"),
        col("facility"), col("severity"))
  }

  // ---------------------------------------------------------------------
  // traffic_stats family (README.md:364-392)
  // ---------------------------------------------------------------------

  /** syslog Traffic Statistics x 4 stat types (bbn_syslog.rb:420-662).
    * Gate F3/F7: no dos_attack_event key, errdefs=Traffic Statistics, stat
    * type in the accepted four.
    */
  def syslogTrafficStats(syBase: DataFrame): DataFrame = {
    val statType = kvv("traffic_stat_type")
    val isCookie = statType === "Cryptographic SYN Cookie"
    syBase
      .filter(kvv("dos_attack_event").isNull &&
        kvv("errdefs_msg_name") === "Traffic Statistics" &&
        statType.isin("Cryptographic SYN Cookie", "Reaped Flow", "Active Flow", "Missed Flow"))
      .select(
        col("conv_id"), col("turn_idx"), col("ts"),
        toUtcOrEmpty(kvv("date_time"), col("offh")).as("device_utc_time"),
        col("offh").as("device_utc_offset"),
        coalesce(kvv("device_vendor"), lit("")).as("device_vendor"),
        coalesce(kvv("device_product"), lit("")).as("device_module"),
        coalesce(kvv("device_version"), lit("")).as("device_version"),
        coalesce(kvv("hostname"), lit("")).as("device_hostname"),
        coalesce(kvv("bigip_mgmt_ip"), lit("")).as("device_ip"),
        coalesce(kvv("context_name"), lit("")).as("virtual_context"),
        coalesce(kvv("partition_name"), lit("")).as("administration_partition"),
        coalesce(statType, lit("")).as("traffic_stat_type"),
        when(!isCookie, coalesce(kvv("traffic_stat_cnt").cast("int"), lit(null)))
          .as("traffic_stat_counter"),
        when(isCookie, kvv("cookie_challenge_issued").cast("int")).as("cookie_challenge_issued"),
        when(isCookie, kvv("cookie_challenge_passed").cast("int")).as("cookie_challenge_passed"),
        when(isCookie, kvv("cookie_flow_accepted").cast("int")).as("cookie_flow_accepted"),
        when(isCookie, kvv("cookie_flow_rejected").cast("int")).as("cookie_flow_rejected"),
        lit("traffic_stats").as("record_type"),
        lit("Syslog").as("remote_log_format"),
        col("msg").as("remote_log_payload"),
        col("facility"), col("severity"))
  }

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
      .filter(kvv("dos_attack_event") === "Attack Stopped")
      .select(
        coalesce(kvv("dos_attack_id").cast("long"), lit(0L)).as("attack_id"),
        toUtcOrEmpty(kvv("date_time"), col("offh")).as("stop_utc"),
        col("ts"))
    // CEF/AFM stop: syslog-regex scan of the *whole* message
    val afmStops = cef
      .filter(col("cef_module") === "Advanced Firewall Module" &&
        dyn("attack_status") === "Attack Stopped")
      .withColumn("sykv", kvSyslog(col("text")))
      .select(
        coalesce(element_at(col("sykv"), "dos_attack_id").cast("long"), lit(0L)).as("attack_id"),
        toUtcOrEmpty(element_at(col("sykv"), "date_time"), col("offh")).as("stop_utc"),
        col("ts"))
    val asmStops = cef
      .filter(col("cef_module") === "ASM" && dyn("attack_status") === "Attack ended")
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
    * orphan stops and ambiguous ids are side-channel logged in the
    * reference and are simply no-ops here. The last stop in stream order
    * wins, matching sequential re-updates.
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

  // ---------------------------------------------------------------------
  // Assembled views
  // ---------------------------------------------------------------------

  def attacksAll(syBase: DataFrame, cef: DataFrame): DataFrame =
    syslogAttackStarts(syBase)
      .unionByName(syslogSyncookies(syBase))
      .unionByName(cefAttackStarts(cef))

  def statsAll(syBase: DataFrame, cef: DataFrame): DataFrame =
    syslogSamples(syBase)
      .unionByName(cefAfmSamples(cef))
      .unionByName(cefAsmStats(cef))

  /** E1+S5: the full routed record stream — all three families, correlated,
    * one superset schema discriminated by record_type, ordered stably by
    * (conv_id, turn_idx) downstream of any sink compare.
    */
  def records(spark: SparkSession, dir: String, rep: Int = 1): DataFrame = {
    configure(spark)
    val t = healthFilter(
      graft.sources.TranscriptStore.table(spark, dir, rep),
      Transcripts.healthStrings(spark))
    val offsets = Transcripts.utcOffsets(spark)
    val sy = syslogBase(t, offsets)
    val cef = cefBase(t, offsets)
    val attacks = correlate(attacksAll(sy, cef), attackStops(sy, cef))
    attacks
      .unionByName(statsAll(sy, cef), allowMissingColumns = true)
      .unionByName(syslogTrafficStats(sy), allowMissingColumns = true)
  }

  /** Post-health transcripts (the pipeline's working set). */
  def transcriptsClean(spark: SparkSession, dir: String, rep: Int = 1): DataFrame = {
    configure(spark)
    healthFilter(graft.sources.TranscriptStore.table(spark, dir, rep),
      Transcripts.healthStrings(spark))
  }

  /** (syslog base, CEF base) pair over the cleaned transcripts. */
  def bases(spark: SparkSession, dir: String, rep: Int = 1): (DataFrame, DataFrame) = {
    val t = transcriptsClean(spark, dir, rep)
    val offsets = Transcripts.utcOffsets(spark)
    (syslogBase(t, offsets), cefBase(t, offsets))
  }

  def attacksCorrelated(spark: SparkSession, dir: String, rep: Int = 1): DataFrame = {
    val (sy, cef) = bases(spark, dir, rep)
    correlate(attacksAll(sy, cef), attackStops(sy, cef))
  }

  /** S7 reject side-output: turns that parse to nothing and are not
    * intentional zero-emitters (stops, CEF syncookie) — the auditable
    * replacement for the reference's file-logger diagnostics
    * (bbn_common.rb:18-49, bbn_syslog.rb:413-417, bbn_cef.rb:42-62).
    * Pure map-side classification; no join against the routed output.
    */
  def rejects(spark: SparkSession, dir: String, rep: Int = 1): DataFrame = {
    val t = transcriptsClean(spark, dir, rep)
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
