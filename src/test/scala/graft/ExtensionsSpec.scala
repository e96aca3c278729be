package graft

/** The kv_extract SQL function surface (SparkSessionExtensions /
  * runtime-registered) must behave like the Scala column API.
  */
class ExtensionsSpec extends SparkSpec {
  test("kv_extract is callable from SQL and matches the column API") {
    import spark.implicits._
    Seq("[a=1 dos_attack_id=42 dos_attack_event=Attack Started]")
      .toDF("text").createOrReplaceTempView("ext_t")
    val r = spark.sql(
      "SELECT kv_extract(text, false)['dos_attack_id'] AS aid, " +
        // CEF mode: ' dos_attack_id=' is not a valid boundary (underscore),
        // so 'a=1' cannot terminate -> absent. The quirk is the assertion.
        "kv_extract(text, true)['a'] AS cef_a FROM ext_t").collect().head
    assert(r.getString(0) == "42")
    assert(r.isNullAt(1))
  }
}
