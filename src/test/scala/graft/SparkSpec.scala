package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one forked JVM per sbt test). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  /** Build a tiny transcripts DF from raw payload texts. */
  def transcriptsOf(texts: Seq[String]): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (txt, i) =>
      (f"conv-$i%02d", i, "user", txt, "none", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  def syBaseOf(texts: Seq[String]): DataFrame =
    graft.operators.Pipeline.syslogBase(transcriptsOf(texts),
      graft.sources.Transcripts.utcOffsets(spark))

  def cefBaseOf(texts: Seq[String]): DataFrame =
    graft.operators.Pipeline.cefBase(transcriptsOf(texts),
      graft.sources.Transcripts.utcOffsets(spark))

  def firstRow(df: DataFrame): Map[String, Any] = {
    val row = df.collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.operators.Pipeline.configure(s)
    s
  }
}
