package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media rides
  * as an opaque `binary` column with typed metadata; decode/feature-extract
  * runs batched per partition (the Scala analog of a Pandas UDF over
  * mapInPandas).
  *
  * The PNG path is a REAL decoder: byte-level header parse (signature,
  * IHDR, big-endian dims, CRC32 verification) over valid PNG containers
  * synthesized in pngBytes — no external codec needed for a header decode.
  * Formats the container has no codec for (jpeg/audio/video frames) keep
  * the deterministic stand-in on the non-PNG branch, with the same schema,
  * typed Dataset boundary, and per-partition batch shape.
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

  // ---- real PNG header codec (public format: RFC 2083 / W3C PNG) ----

  private val PngSig: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a.toByte, '\n')

  private def crc32(typ: Array[Byte], data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(typ); c.update(data)
    c.getValue.toInt
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    java.nio.ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc32(t, data)).array()
  }

  /** A valid minimal PNG container (signature + IHDR + IEND, real CRC32s):
    * 45 bytes total, 8-bit truecolor header. Used to synthesize media blobs
    * deterministically — the container ships no image corpus — while the
    * decoder below does REAL byte parsing, not arithmetic on the length.
    */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IEND", Array.emptyByteArray)
  }

  /** Decode: real PNG header parsing when the blob IS a PNG (signature +
    * IHDR tag + CRC verified, width/height read big-endian from bytes
    * 16-23); otherwise the legacy deterministic stand-in for opaque blobs
    * (the synthetic documents corpus has no media bytes at all — the
    * stand-in keeps that path's schema/partitioning plumbing exercised).
    */
  private[graft] def decodeOne(docId: Long, bytes: Array[Byte]): DecodedMeta = {
    val len = bytes.length.toLong
    val isPng = len >= 33 &&
      bytes.take(8).sameElements(PngSig) &&
      new String(bytes, 12, 4, java.nio.charset.StandardCharsets.US_ASCII) == "IHDR"
    if (isPng) {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val dataLen = bb.getInt(8)
      // the length field itself is untrusted input: a corrupt/hostile value
      // must yield format="corrupt", not an out-of-bounds crash of the task
      // (IHDR data is fixed 13 bytes; chunk needs 16 + dataLen + 4 <= len)
      val lenOk = dataLen == 13 && len >= 16 + dataLen + 4
      val crcOk = lenOk && {
        val ihdr = java.util.Arrays.copyOfRange(bytes, 16, 16 + dataLen)
        bb.getInt(16 + dataLen) ==
          crc32("IHDR".getBytes(java.nio.charset.StandardCharsets.US_ASCII), ihdr)
      }
      DecodedMeta(
        doc_id = docId,
        byte_len = len,
        width = if (lenOk) bb.getInt(16) else 0,
        height = if (lenOk) bb.getInt(20) else 0,
        n_frames = 1,
        format = if (crcOk) "png" else "corrupt")
    } else DecodedMeta(
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

  /** documents -> synthesized PNG blobs (one per doc, dims a fixed function
    * of doc_id so the oracle can recompute them WITHOUT parsing bytes — the
    * Spark side decodes the actual bytes, the oracle derives from the
    * generating arithmetic, and agreement proves the decode is real).
    */
  def pngMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, pngBytes((16 + id % 64).toInt, (16 + (id / 64) % 64).toInt)))
      .toDF()
  }

  /** Real-decode query surface: synthesize PNGs, decode their headers
    * batched per partition.
    */
  def decodedPng(spark: SparkSession, docs: DataFrame): DataFrame =
    decode(spark, pngMediaTable(spark, docs)).toDF()

  // ---- real WAV/RIFF header codec (public format: RIFF WAVE, PCM) ----

  case class WavMeta(doc_id: Long, byte_len: Long, sample_rate: Int,
                     n_channels: Int, bits_per_sample: Int, n_samples: Long,
                     duration_us: Long, format: String)

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** A valid minimal canonical WAV container (RIFF + fmt + data, PCM),
    * little-endian fields — the endianness COMPLEMENT of the PNG path, so
    * the two decoders together pin both byte orders. `nSamples` zero-filled
    * sample frames are appended so every size field is honest.
    */
  def wavBytes(sampleRate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val frame = channels * (bits / 8)
    val dataSize = nSamples * frame
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(ascii("RIFF")).putInt(36 + dataSize).put(ascii("WAVE"))
      .put(ascii("fmt ")).putInt(16)
      .putShort(1.toShort)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * frame)                // byte rate
      .putShort(frame.toShort)                   // block align
      .putShort(bits.toShort)
      .put(ascii("data")).putInt(dataSize)
    bb.array()
  }

  /** Real WAV header decode: magic + chunk tags verified, fields read
    * little-endian, size fields cross-checked against the actual buffer
    * (untrusted input never indexes out of bounds — mismatches decode as
    * format="corrupt", the task never crashes). Canonical fmt-then-data
    * layout only, documented: the synthesizer above emits exactly that.
    */
  private[graft] def decodeWavOne(docId: Long, bytes: Array[Byte]): WavMeta = {
    val len = bytes.length.toLong
    def tag(off: Int, s: String): Boolean =
      len >= off + 4 && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, off, off + 4), ascii(s))
    val shaped = len >= 44 && tag(0, "RIFF") && tag(8, "WAVE") &&
      tag(12, "fmt ") && tag(36, "data")
    if (!shaped)
      return WavMeta(docId, len, 0, 0, 0, 0L, 0L, "not_wav")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val riffSize = bb.getInt(4)
    val fmtSize = bb.getInt(16)
    val audioFmt = bb.getShort(20).toInt
    val channels = bb.getShort(22).toInt
    val rate = bb.getInt(24)
    val bits = bb.getShort(34).toInt
    val dataSize = bb.getInt(40)
    val frame = channels * (bits / 8)
    val ok = riffSize == len - 8 && fmtSize == 16 && audioFmt == 1 &&
      dataSize == len - 44 && frame > 0 && rate > 0
    if (!ok) WavMeta(docId, len, 0, 0, 0, 0L, 0L, "corrupt")
    else {
      val nSamples = dataSize.toLong / frame
      WavMeta(docId, len, rate, channels, bits, nSamples,
        nSamples * 1000000L / rate, "wav")
    }
  }

  /** documents -> synthesized WAV blobs; rate/channels/bits/samples are a
    * fixed function of doc_id so the oracle recomputes the expected decode
    * from arithmetic while the engine parses the actual bytes (same
    * agreement-proves-decode contract as decodedPng).
    */
  def wavMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, wavBytes(
        sampleRate = (8000 + (id % 5) * 4000).toInt,
        channels = (1 + id % 2).toInt,
        bits = if (id % 3 == 0) 16 else 8,
        nSamples = (100 + id % 900).toInt)))
      .toDF()
  }

  def decodedWav(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    wavMediaTable(spark, docs).select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions(_.map(r => decodeWavOne(r.doc_id, r.content)))
      .toDF()
  }

  /** Deterministic frame sampling (the video feature-extract shape): every
    * `every`-th frame index per document, bounded by the DECODED n_frames —
    * the downstream extractor then joins frames back to blobs co-partitioned
    * by doc_id, so no frame row ever moves without its document. The explode
    * is over a sequence bounded by a decoded metadata column behind the
    * typed-Dataset boundary; there is no expression for the optimizer to
    * push into a scan, and the fan-out is bounded by n_frames/every per row.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame, every: Int = 2): DataFrame =
    decode(spark, mediaTable(docs)).toDF()
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"))
}
