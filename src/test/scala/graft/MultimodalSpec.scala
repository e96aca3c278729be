package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The PNG path must be a real byte-level decode: dims come from the IHDR
  * bytes (not from arithmetic on the blob length), and a flipped bit that
  * breaks the CRC is detected.
  */
class MultimodalSpec extends SparkSpec {

  test("frame sampling emits every k-th index bounded by decoded n_frames") {
    import spark.implicits._
    // text length picks n_frames = 1 + len % 5: len 4 -> 5 frames, len 5 -> 1
    val docs = Seq((1L, "abcd"), (2L, "abcde")).toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val out = graft.operators.Multimodal.sampleFrames(spark, docs, every = 2)
      .orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(out == Seq((1L, 0, 5), (1L, 2, 5), (1L, 4, 5), (2L, 0, 1)))
  }

  test("PNG header decode parses real bytes and verifies the IHDR CRC") {
    val good = Multimodal.pngBytes(123, 77)
    assert(good.length == 45) // signature 8 + IHDR 25 + IEND 12
    val meta = Multimodal.decodeOne(42L, good)
    assert(meta.width == 123 && meta.height == 77)
    assert(meta.format == "png" && meta.n_frames == 1 && meta.byte_len == 45L)

    // flip one width bit WITHOUT fixing the CRC: a length-based stub would
    // not notice; a real parser must
    val corrupt = good.clone()
    corrupt(18) = (corrupt(18) ^ 0x01).toByte
    assert(Multimodal.decodeOne(1L, corrupt).format == "corrupt")

    // non-PNG blobs keep the opaque-blob stand-in contract
    val opaque = Multimodal.decodeOne(7L, "hello world".getBytes("UTF-8"))
    assert(opaque.format == "jpeg" || opaque.format == "png")

    // a corrupted LENGTH field (any value but 13, including negative or
    // past-the-buffer) must classify as corrupt, never crash the task
    for (b <- Seq(0x80.toByte, 0x7f.toByte, 141.toByte)) {
      val badLen = good.clone()
      badLen(11) = b // low byte of the IHDR chunk length
      assert(Multimodal.decodeOne(2L, badLen).format == "corrupt")
      val badLenHi = good.clone()
      badLenHi(8) = b // high byte: huge/negative lengths
      assert(Multimodal.decodeOne(3L, badLenHi).format == "corrupt")
    }
  }

  test("WAV header decode reads little-endian fields and rejects corrupt sizes") {
    val good = Multimodal.wavBytes(sampleRate = 16000, channels = 2, bits = 16, nSamples = 250)
    assert(good.length == 44 + 250 * 4)
    val m = Multimodal.decodeWavOne(5L, good)
    assert(m.sample_rate == 16000 && m.n_channels == 2 && m.bits_per_sample == 16)
    assert(m.n_samples == 250L && m.format == "wav")
    // 250 samples at 16 kHz = 15625 us exactly
    assert(m.duration_us == 15625L)

    // wrong magic -> not_wav
    val notWav = good.clone(); notWav(0) = 'X'.toByte
    assert(Multimodal.decodeWavOne(1L, notWav).format == "not_wav")
    // truncated buffer: data size no longer matches -> corrupt, no crash
    assert(Multimodal.decodeWavOne(2L, good.take(100)).format == "corrupt")
    // lying RIFF size -> corrupt
    val badSize = good.clone(); badSize(4) = (badSize(4) ^ 0x01).toByte
    assert(Multimodal.decodeWavOne(3L, badSize).format == "corrupt")
    // zero-channel header (division guard) -> corrupt
    val zeroCh = good.clone(); zeroCh(22) = 0; zeroCh(23) = 0
    assert(Multimodal.decodeWavOne(4L, zeroCh).format == "corrupt")
    // tiny garbage -> not_wav
    assert(Multimodal.decodeWavOne(6L, Array[Byte](1, 2, 3)).format == "not_wav")
  }

  test("distributed PNG decode matches the doc_id generating arithmetic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val decoded = Multimodal.decodedPng(spark, docs)
    val bad = decoded.filter(
      col("width") =!= (lit(16) + col("doc_id") % 64).cast("int") ||
        col("height") =!= (lit(16) + (col("doc_id") / 64).cast("long") % 64).cast("int") ||
        col("format") =!= "png" || col("byte_len") =!= 45L)
    assert(bad.count() == 0)
    assert(decoded.count() == docs.count())
  }
}
