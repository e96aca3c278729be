package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the `transcripts` input table
  * (conv_id:string, turn_idx:int, role:string, text:string, tool:string,
  * ts:timestamp — the BASELINE.json input_hint shape) from the driver's
  * `events.parquet`, using pure arithmetic on `event_id` so the DuckDB
  * oracle recomputes the exact same table (and the expected parse output)
  * independently. No wall clock, no RNG — seed-free and reproducible.
  *
  * Every `event_id` (times an optional amplification factor for benching)
  * yields a surrogate id n; episode k = n/20 and slot s = n%20 select one of
  * 20 payload branches covering every parser path of the reference plugin
  * (SURVEY.md §2, FIXTURES.md §3):
  *
  *   s=0  syslog Attack Started        s=10 CEF/AFM Attack Started
  *   s=1  syslog Attack Sampled (ctx)  s=11 CEF/AFM Attack Sampled
  *   s=2  syslog Attack Sampled        s=12 CEF/AFM Syncookie | DNS sample
  *   s=3  syslog Attack Stopped        s=13 CEF/AFM Attack Stopped
  *   s=4  syslog TCP Syncookie         s=14 CEF/ASM Attack started
  *   s=5  syslog TS/Crypt. SYN Cookie  s=15 CEF/ASM Mitigation stats
  *   s=6  syslog TS/Reaped Flow        s=16 CEF/ASM Mitigation changed
  *   s=7  syslog TS/Active Flow        s=17 CEF/ASM Attack ended
  *   s=8  syslog TS/Missed Flow        s=18 health-check string (dropped)
  *   s=9  syslog unknown DoS event     s=19 unknown/reject formats
  *
  * Attack-id scheme (drives the W3 lifecycle correlation): base = 1000+10k;
  * syslog start/stop use base, CEF/AFM base+1, CEF/ASM base+2, syncookie
  * base+4. Orphan stops (k%13==0 on s=3) and duplicate starts (k%17==0 puts
  * the AFM start on base too) exercise the reference's 0-hit / >1-hit
  * log-only paths (bbn_syslog.rb:298-307).
  *
  * Hot-conversation skew: n%10 in {0,1,2} routes ~30% of turns into three
  * hot conv_ids (FIXTURES.md §1) to exercise salting at scale.
  */
object Transcripts {

  val HealthString = "default send string" // bbn_f5networks.rb:65
  val HostA = "172.16.21.40" // per-host UTC offset +2 (J1 dictionary)
  val HostB = "172.16.21.41" // offset 0

  /** events.parquet -> one row per synthetic turn with every derived field
    * the payload renderer and the oracle share. `rep` amplifies the table
    * (bench only; correctness runs use rep=1 so the oracle stays exact).
    */
  def derived(spark: SparkSession, dir: String, rep: Int = 1): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet").select("event_id", "ts")
    val amplified =
      if (rep <= 1) ev.withColumn("n", col("event_id")).withColumn("ts2", col("ts"))
      else ev
        // events.parquet is one small file (one input split); spread the
        // rows BEFORE the explode so amplification renders in parallel
        .repartition(math.max(spark.sparkContext.defaultParallelism, 8))
        .withColumn("r", explode(sequence(lit(0), lit(rep - 1))))
        .withColumn("n", col("event_id") * rep + col("r"))
        .withColumn("ts2", expr("timestampadd(SECOND, r, ts)"))
        .drop("r")

    val n = col("n")
    val k = floor(n / 20).as("k")
    amplified
      .withColumn("k", k)
      .withColumn("s", pmod(n, lit(20)).cast("int"))
      .withColumn("host", when(pmod(n, lit(7)) === 0, HostA).otherwise(HostB))
      .withColumn("offh", when(col("host") === HostA, 2).otherwise(0))
      .withColumn("hostname", concat(lit("bigip"), (pmod(n, lit(3)) + 1), lit(".lab")))
      .withColumn("dt", date_format(col("ts2"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("sev", pmod(n, lit(8)).cast("int"))
      .withColumn("act", when(pmod(col("k"), lit(2)) === 0, "Drop").otherwise("Allow"))
      .withColumn("aname",
        element_at(array(lit("Flood attack"), lit("Sweep attack"),
          lit("Bad TCP flags"), lit("UDP fragment flood")),
          (pmod(col("k"), lit(4)) + 1).cast("int")))
      .withColumn("vs", concat(lit("/Common/vs"), pmod(n, lit(4))))
      .withColumn("recv", (pmod(n, lit(5000)) + 100).cast("int"))
      .withColumn("drops", pmod(n, lit(100)).cast("int"))
      .withColumn("flow",
        when(pmod(n, lit(11)) === 0, "0000000000000000")
          .otherwise(concat(lit("000000000000"), lpad((pmod(n, lit(9999)) + 1).cast("string"), 4, "0"))))
      .withColumn("sip", concat(lit("10.0."), pmod(n, lit(250)), lit("."), pmod(n, lit(97))))
      .withColumn("spt", (pmod(n, lit(40000)) + 1024).cast("int"))
      .withColumn("dpt", when(pmod(col("k"), lit(2)) === 0, 80).otherwise(53))
      .withColumn("vlan", concat(lit("/Common/vlan"), pmod(n, lit(30))))
      .withColumn("cnt", pmod(n, lit(100000)).cast("int"))
      .withColumn("ci", pmod(n, lit(1000)).cast("int"))
      .withColumn("cp", pmod(n, lit(900)).cast("int"))
      .withColumn("ca", pmod(n, lit(800)).cast("int"))
      .withColumn("cr", pmod(n, lit(50)).cast("int"))
      .withColumn("qn", concat(lit("q"), pmod(n, lit(50)), lit(".example.com")))
      .withColumn("cat1", when(pmod(col("k"), lit(2)) === 0, "DNS Event").otherwise("Network DoS Event"))
      .withColumn("detmode", when(pmod(col("k"), lit(2)) === 0, "TPS Increased").otherwise("Latency Increased"))
      .withColumn("base", lit(1000) + col("k") * 10)
      .withColumn("aid_sy", when(col("s") === 3 && pmod(col("k"), lit(13)) === 0, lit(999999999L)).otherwise(col("base")))
      .withColumn("aid_afm", when(col("s") === 10 && pmod(col("k"), lit(17)) === 0, col("base")).otherwise(col("base") + 1))
      .withColumn("aid_afm1", col("base") + 1)
      .withColumn("aid_asm", col("base") + 2)
      .withColumn("aid_syn", col("base") + 4)
      .withColumn("conv_id",
        when(pmod(n, lit(10)) < 3, concat(lit("conv-hot-"), pmod(n, lit(10))))
          .otherwise(concat(lit("conv-"), lpad(pmod(n, lit(97)).cast("string"), 4, "0"))))
      .withColumn("turn_idx",
        when(pmod(n, lit(10)) < 3, floor(n / 10)).otherwise(floor(n / 97)).cast("int"))
      .withColumn("role",
        element_at(array(lit("user"), lit("assistant"), lit("tool"), lit("system")),
          (pmod(n, lit(4)) + 1).cast("int")))
      .withColumn("tool",
        element_at(array(lit("afm"), lit("asm"), lit("dns_guard"), lit("syn_guard"), lit("none")),
          (pmod(n, lit(5)) + 1).cast("int")))
  }

  /** The rendered transcripts table: input_hint shape exactly. */
  def transcripts(spark: SparkSession, dir: String, rep: Int = 1): DataFrame =
    withText(derived(spark, dir, rep))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), col("ts2").as("ts"))

  /** derived() plus the rendered `text` payload column. The payload
    * templates live in Payloads as literal/column fragment specs shared with
    * the DuckDB oracle renderer, so both engines produce byte-identical
    * text by construction.
    */
  def withText(d: DataFrame): DataFrame =
    d.withColumn("text", Payloads.textColumn)

  /** J1: host -> UTC-offset-hours broadcast dictionary (the reference's
    * explicit_utc_offset config, bbn_f5networks.rb:298-316).
    */
  def utcOffsets(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((HostA, 2), (HostB, 0)).toDF("host", "utc_offset_h")
  }

  /** J2: host -> health-check payload to drop (bbn_f5networks.rb:205-229). */
  def healthStrings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((HostA, HealthString), (HostB, HealthString)).toDF("host", "health")
  }

  /** J3: north-rule role/tool enrichment dictionaries. */
  def roleDict(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("user", "human"), ("assistant", "model"), ("tool", "machine"),
      ("system", "machine")).toDF("role", "role_class")
  }
  def toolDict(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("afm", "firewall"), ("asm", "appsec"), ("dns_guard", "dns"),
      ("syn_guard", "tcp"), ("none", "none")).toDF("tool", "tool_family")
  }
}
