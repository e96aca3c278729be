package graft

import java.nio.file.Files
import graft.operators.{Pipeline, Router}

/** The MERGE-shaped routed write must equal the pure-DataFrame records()
  * (same rows, same lifecycle resolution) — they are two physical plans for
  * one logical result.
  */
class RouterSpec extends SparkSpec {

  test("Router.route sinks equal Pipeline.records including lifecycle fields") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-router").toString
    Router.route(spark, dir, out)
    val routed = Router.readRouted(spark, out)
    val direct = Pipeline.records(spark, dir)

    assert(routed.count() == direct.count())
    val key = Seq("record_type", "conv_id", "turn_idx", "attack_id",
      "attack_ongoing", "attack_end_date", "remote_log_payload")
    val a = routed.select(key.head, key.tail: _*)
    val b = direct.select(key.head, key.tail: _*)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
