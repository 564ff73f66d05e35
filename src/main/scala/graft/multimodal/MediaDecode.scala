package graft.multimodal

/** Dependency-free REAL media decoders for the formats a zero-library
  * container can honestly parse: binary PPM (P6) images and PCM WAV
  * audio. These replace the byte-histogram stub wherever the mime type
  * declares a known format; unknown/undeclared payloads still fall back
  * to [[DecodeStub]] (the production contract: a decoder must never
  * fail the pipeline on a corrupt blob — it degrades to opaque-bytes
  * features).
  *
  * All statistics are INTEGER sums over the decoded samples (exact in
  * any accumulation order), divided once at the end — the same
  * portability discipline as DecodeStub, so the outputs are
  * replayable by an external engine (the q_multimodal_real oracle).
  */
object MediaDecode {

  /** Decoded raster: dimensions plus exact per-channel byte sums. */
  final case class PpmImage(
      width: Int, height: Int, maxVal: Int,
      rSum: Long, gSum: Long, bSum: Long)

  /** Decoded PCM audio: format fields plus exact sample moments. */
  final case class WavAudio(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Long, sum: Long, sumSq: Long, peak: Int)

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  /** Parse a binary PPM (P6): magic, whitespace/comment-separated
    * width/height/maxval, one whitespace, then w·h·3 RGB bytes. Returns
    * None on any malformed header or truncated pixel area. */
  def decodePpm(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes == null || bytes.length < 9) return None
    if (bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipWsAndComments(): Unit = {
      var moved = true
      while (moved && pos < bytes.length) {
        moved = false
        while (pos < bytes.length && isWs(bytes(pos))) { pos += 1; moved = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          moved = true
        }
      }
    }
    def readInt(): Option[Int] = {
      skipWsAndComments()
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (bytes(pos) - '0')
        pos += 1
      }
      if (pos == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxVal <- readInt()
      if w > 0 && h > 0 && maxVal > 0 && maxVal < 65536
      // exactly ONE whitespace byte separates maxval from the raster
      if pos < bytes.length && isWs(bytes(pos))
      start = pos + 1
      // 16-bit-per-channel rasters (maxVal > 255) are out of scope
      if maxVal <= 255
      if bytes.length - start >= w.toLong * h * 3
      img <- {
        var (r, g, b) = (0L, 0L, 0L)
        var i = start
        val end = start + w * h * 3
        while (i < end) {
          r += bytes(i) & 0xff
          g += bytes(i + 1) & 0xff
          b += bytes(i + 2) & 0xff
          i += 3
        }
        Some(PpmImage(w, h, maxVal, r, g, b))
      }
    } yield img
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Parse a RIFF/WAVE container with a PCM (format 1) 16-bit `fmt `
    * chunk and a `data` chunk; chunks are walked in order with word
    * alignment. Returns None for non-PCM, non-16-bit, or malformed
    * containers. */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')) return None
    if (!(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(bytes.slice(pos, pos + 4), "US-ASCII")
      val size = le32(bytes, pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = le16(bytes, pos + 8)
          if (audioFormat != 1) return None // PCM only
          fmt = Some((le16(bytes, pos + 10), le32(bytes, pos + 12), le16(bytes, pos + 22)))
        case "data" => data = Some((pos + 8, size))
        case _ => ()
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    for {
      (channels, rate, bits) <- fmt
      if bits == 16 && channels > 0
      (off, len) <- data
      audio <- {
        val n = len / 2
        var (s, s2) = (0L, 0L)
        var peak = 0
        var i = 0
        while (i < n) {
          val v = (le16(bytes, off + 2 * i) << 16) >> 16 // sign-extend
          s += v
          s2 += v.toLong * v
          if (math.abs(v) > peak) peak = math.abs(v)
          i += 1
        }
        Some(WavAudio(rate, channels, bits, n.toLong, s, s2, peak))
      }
    } yield audio
  }

  /** The decodeFeatures dispatch: a REAL decode for declared,
    * parseable formats; [[DecodeStub]] otherwise. Image features are
    * per-channel means repeated across slots, scaled to the stub's
    * [0, dim] range. Audio features are (mean, rms, peak)-derived and
    * scaled by the same dim factor, but the MEAN slot keeps its sign:
    * a PCM mean sample can be negative, so audio slots land in
    * [-dim, dim] (rms/peak slots stay in [0, dim]) — consumers must
    * not assume the stub's non-negative range for audio. */
  def features(bytes: Array[Byte], mimeType: String, dim: Int): Array[Double] =
    (mimeType match {
      case "image/x-portable-pixmap" => decodePpm(bytes).map { img =>
        val n = img.width.toLong * img.height
        val means = Array(img.rSum, img.gSum, img.bSum)
          .map(s => s.toDouble / 255.0 / n * dim)
        Array.tabulate(dim)(i => means(i % 3))
      }
      case "audio/wav" => decodeWav(bytes).map { a =>
        val mean = if (a.nSamples == 0) 0.0 else a.sum.toDouble / a.nSamples
        val rms = if (a.nSamples == 0) 0.0 else math.sqrt(a.sumSq.toDouble / a.nSamples)
        val scaled = Array(mean / 32768.0, rms / 32768.0, a.peak.toDouble / 32768.0)
        Array.tabulate(dim)(i => scaled(i % 3) * dim)
      }
      case _ => None
    }).getOrElse(DecodeStub.decode(bytes, dim))
}
