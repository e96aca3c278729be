package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: dump formatted physical plans for the load-bearing
  * queries so plan regressions (lost pushdown, surprise shuffles, dropped
  * broadcasts, codegen breaks) are visible at a glance.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    operators.Pipeline.configure(spark)

    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    show("records (single-pass parse->route)", operators.Pipeline.records(spark, dir))
    show("attacksCorrelated (pruned branches + narrow facts scan)",
      operators.Pipeline.attacksCorrelated(spark, dir))
    show("q15 attackRollup (one scan, window aggregates)",
      operators.Pipeline.attackRollup(spark, dir))
    show("q08_sink_counts", SparkEntry.queries("q08_sink_counts")(spark, dir))
    show("q09_agg_facility", SparkEntry.queries("q09_agg_facility")(spark, dir))
    show("q26_minhash_lsh", SparkEntry.queries("q26_minhash_lsh")(spark, dir))
    show("q27_ann_brute", SparkEntry.queries("q27_ann_brute")(spark, dir))
    show("q45_ivf_ann (frozen quantizer serving path)",
      SparkEntry.queries("q45_ivf_ann")(spark, dir))
    show("q71_dup_spans (positional index + island merge)",
      SparkEntry.queries("q71_dup_spans")(spark, dir))
    show("q72_strip_spans (span-removal rebuild)",
      SparkEntry.queries("q72_strip_spans")(spark, dir))
    show("q73_lm_score (stupid-backoff joins + ordered fold)",
      SparkEntry.queries("q73_lm_score")(spark, dir))
    show("q77_dsir_weights (broadcast count vectors)",
      SparkEntry.queries("q77_dsir_weights")(spark, dir))
    show("q79_curriculum (two-level rank)",
      SparkEntry.queries("q79_curriculum")(spark, dir))
    spark.stop()
  }
}
