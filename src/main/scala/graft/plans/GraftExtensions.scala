package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.KvExtract

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so SQL users get the same native
  * parse path as the Scala API:
  *
  *   spark.sql("SELECT kv_extract(text, false)['dos_attack_id'] FROM t")
  *
  * Activate via `spark.sql.extensions=graft.plans.GraftExtensions` or by
  * calling `GraftExtensions.register(spark)` on a live session (what
  * Pipeline.configure does — the driver creates sessions without the
  * extensions conf).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.kvExtractFn)
}

object GraftExtensions {

  private def buildKvExtract(args: Seq[Expression]): Expression = {
    require(args.length == 2, "kv_extract(text, cefMode) takes 2 arguments")
    val cef = args(1) match {
      case Literal(b: Boolean, _) => b
      case other => throw new IllegalArgumentException(
        s"kv_extract: cefMode must be a boolean literal, got $other")
    }
    KvExtract(args.head, cef)
  }

  val kvExtractFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kv_extract"),
    new ExpressionInfo(classOf[KvExtract].getName, "kv_extract"),
    buildKvExtract)

  /** Runtime registration on an existing session. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      kvExtractFn._1, kvExtractFn._2, kvExtractFn._3)
}
