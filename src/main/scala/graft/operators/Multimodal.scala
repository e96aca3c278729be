package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media rides
  * as an opaque `binary` column with typed metadata; decode/feature-extract
  * runs batched per partition (the Scala analog of a Pandas UDF over
  * mapInPandas).
  *
  * The decode step itself is a clearly-marked STUB — this container ships
  * no image/audio codecs — but everything Spark-side is real and tested:
  * the schema, the typed Dataset boundary, the per-partition batch shape,
  * and the deterministic metadata contract the oracle checks.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, content: Array[Byte])
  case class DecodedMeta(doc_id: Long, byte_len: Long, width: Int, height: Int,
                         n_frames: Int, format: String)

  /** documents -> opaque media table (text bytes stand in for media blobs;
    * schema is what matters: id + binary + pass-through metadata).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("content"),
      col("source").as("media_source"))

  /** STUB DECODE: deterministic fake dimensions derived from the byte
    * length. A real deployment swaps `decodeOne` for an actual decoder
    * (e.g. javax.imageio / ffmpeg bindings) — the partition-batched
    * Dataset plumbing around it is unchanged.
    */
  private def decodeOne(docId: Long, bytes: Array[Byte]): DecodedMeta = {
    val len = bytes.length.toLong
    DecodedMeta(
      doc_id = docId,
      byte_len = len,
      width = (16 + len % 32).toInt,
      height = (16 + (len / 32) % 32).toInt,
      n_frames = (1 + len % 5).toInt,
      format = if (len % 2 == 0) "png" else "jpeg")
  }

  /** Batched decode over the typed Dataset boundary: one iterator pass per
    * partition (no per-row task overhead, no driver collect), mirroring
    * mapInPandas batch semantics.
    */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions(_.map(r => decodeOne(r.doc_id, r.content)))
  }

  /** Decoded metadata + resize plan (the downstream feature-extract shape:
    * partition by target bucket so same-size batches co-locate).
    */
  def decodedMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decode(spark, mediaTable(docs)).toDF()
      .withColumn("resize_target",
        when(col("width") >= 32, 32).otherwise(16))
}
