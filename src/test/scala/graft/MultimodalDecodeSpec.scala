package graft

import graft.multimodal.{DecodeStub, MediaDecode, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def ppmBytes(w: Int, h: Int, pixels: Array[Byte],
      header: String = null): Array[Byte] = {
    val hdr = Option(header).getOrElse(s"P6\n$w $h\n255\n")
    hdr.getBytes("US-ASCII") ++ pixels
  }

  test("decodePpm parses a golden P6 image bit-exactly") {
    // 2x2 RGB: known channel sums r=1+4+7+10, g=2+5+8+11, b=3+6+9+12
    val px = (1 to 12).map(_.toByte).toArray
    val img = MediaDecode.decodePpm(ppmBytes(2, 2, px)).get
    assert(img.width == 2 && img.height == 2 && img.maxVal == 255)
    assert(img.rSum == 22L && img.gSum == 26L && img.bSum == 30L)
    // comments and extra whitespace in the header are legal PPM
    val commented = MediaDecode.decodePpm(
      ppmBytes(2, 2, px, "P6\n# a comment\n 2\t2 #w h\n255\n")).get
    assert(commented == img)
  }

  test("decodePpm rejects malformed blobs (magic, truncation, maxval)") {
    val px = (1 to 12).map(_.toByte).toArray
    assert(MediaDecode.decodePpm(ppmBytes(2, 2, px, "P5\n2 2\n255\n")).isEmpty)
    assert(MediaDecode.decodePpm(ppmBytes(2, 2, px.take(11))).isEmpty) // truncated raster
    assert(MediaDecode.decodePpm(ppmBytes(2, 2, px, "P6\n2 2\n70000\n")).isEmpty)
    assert(MediaDecode.decodePpm("P6".getBytes).isEmpty)
    assert(MediaDecode.decodePpm(Array.empty[Byte]).isEmpty)
  }

  private def wavBytes(samples: Array[Short], rate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("decodeWav parses PCM16 moments exactly; rejects non-PCM") {
    val samples = Array[Short](100, -200, 300, 0, -32768)
    val a = MediaDecode.decodeWav(wavBytes(samples)).get
    assert(a.sampleRate == 8000 && a.channels == 1 && a.bitsPerSample == 16)
    assert(a.nSamples == 5L)
    assert(a.sum == samples.map(_.toLong).sum)
    assert(a.sumSq == samples.map(s => s.toLong * s).sum)
    assert(a.peak == 32768)
    // float-format WAV (format 3) must be rejected, not misread
    val bad = wavBytes(samples)
    bad(20) = 3 // audioFormat
    assert(MediaDecode.decodeWav(bad).isEmpty)
    assert(MediaDecode.decodeWav("RIFFxxxx".getBytes).isEmpty)
  }

  test("features dispatch: declared formats decode for real, everything else stubs") {
    val px = (1 to 12).map(_.toByte).toArray
    val ppm = ppmBytes(2, 2, px)
    val real = MediaDecode.features(ppm, "image/x-portable-pixmap", 6)
    // r/g/b means repeated across 6 slots
    assert(real.toSeq == Seq(22.0, 26.0, 30.0, 22.0, 26.0, 30.0)
      .map(s => s / 255.0 / 4 * 6))
    // same bytes with an opaque mime → stub path
    assert(MediaDecode.features(ppm, "application/octet-stream", 6)
      .toSeq == DecodeStub.decode(ppm, 6).toSeq)
    // declared PPM but corrupt → graceful stub fallback, no throw
    assert(MediaDecode.features(px, "image/x-portable-pixmap", 6)
      .toSeq == DecodeStub.decode(px, 6).toSeq)
    val wav = wavBytes(Array[Short](1000, -1000))
    val aw = MediaDecode.features(wav, "audio/wav", 3)
    assert(aw(1) > 0 && aw(2) > 0) // rms + peak populated
  }

  test("packPpm emits REAL parseable PPM blobs; decodeImages roundtrips the stats") {
    val docs = Seq(
      (1L, "abcdef"), // 6 bytes -> padded to one 48-byte row
      (2L, "x" * 100), // 100 bytes -> 3 rows
      (3L, "") // empty -> one all-zero row
    ).toDF("doc_id", "text")
    val packed = Multimodal.packPpm(docs, "doc_id", "text")
    assert(packed.filter(col("mime_type") =!= "image/x-portable-pixmap").count() == 0)
    val out = Multimodal.decodeImages(spark, packed).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).width == 16 && out(1L).height == 1)
    assert(out(2L).height == 3)
    assert(out(3L).height == 1 && out(3L).r_sum == 0L)
    // channel sums = payload bytes at positions ≡ channel (mod 3)
    val bytes = "abcdef".getBytes("UTF-8")
    def chSum(c: Int) = bytes.zipWithIndex.collect {
      case (b, i) if i % 3 == c => (b & 0xff).toLong
    }.sum
    assert(out(1L).r_sum == chSum(0) && out(1L).g_sum == chSum(1) && out(1L).b_sum == chSum(2))
  }
}
