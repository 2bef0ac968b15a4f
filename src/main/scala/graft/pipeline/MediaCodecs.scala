package graft.pipeline

import java.io.ByteArrayInputStream

/** Real pure-JVM media codecs behind the [[MediaCodec]] seam — no external
  * libraries: WAV PCM via `javax.sound.sampled` and BMP/PNG (any
  * ImageIO-supported container) via `javax.imageio`. Each decodes the
  * payload for real and emits exact integer statistics of the recovered
  * samples/pixels, so an arithmetic oracle over the generating recipe
  * (see [[MediaSynth]]) pins the full encode → container → decode chain:
  * a mis-parsed header, wrong endianness, or channel mix-up shifts the
  * stats and fails the gate.
  *
  * Stats are chosen to be EXACT in both engines: integer counts/sums
  * (each well under 2^53, so lossless in the DoubleType feature vector)
  * rather than rounded floats like RMS or mean.
  */
/** Malformed-input tolerance shared by the real codecs: a payload the
  * decoder cannot handle yields the SAME zero vector as a null/empty
  * payload instead of throwing — in a billion-row batch one corrupt
  * file must not abort the job (the batch analogue of the streaming
  * layer's one-bad-record stance). Failures stay observable without a
  * schema change: every well-formed payload decodes to a count slot
  * ≥ 1 (a WAV has ≥ 1 sample, an image ≥ 1 pixel), so
  * `count_slot = 0 AND octet_length(payload) > 0` identifies the
  * undecodable rows exactly — see `Queries.pMediaDecodeRobust`.
  */
private[pipeline] abstract class TolerantStatsCodec extends MediaCodec {

  /** Decode ONE non-empty payload; may throw on malformed input. */
  protected def decodeOne(payload: Array[Byte]): Array[Double]

  final override def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[Array[Double]] =
    payloads.map { payload =>
      if (payload == null || payload.isEmpty) new Array[Double](featureDim)
      else
        try decodeOne(payload)
        catch { case scala.util.control.NonFatal(_) => new Array[Double](featureDim) }
    }
}

final class WavPcmStatsCodec extends TolerantStatsCodec {

  /** [n_samples, sample_rate, channels, sum, sum_sq, min, max, first] */
  override val featureDim: Int = 8

  /** Decodable = mono 16-bit PCM. Multi-channel WAVs are rejected (zero
    * vector) rather than mis-summarized: with interleaved channels,
    * per-"sample" stats would silently mix channels and count
    * frames×channels — there is no single well-defined sample stream to
    * summarize, so the codec only accepts the one layout whose stats are
    * exact.
    */
  override protected def decodeOne(payload: Array[Byte]): Array[Double] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"WavPcmStatsCodec handles 16-bit PCM, got ${fmt.getSampleSizeInBits}")
      require(fmt.getChannels == 1,
        s"WavPcmStatsCodec handles mono only, got ${fmt.getChannels} channels")
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      var sum = 0.0
      var sumSq = 0.0
      var min = Double.MaxValue
      var max = Double.MinValue
      var first = 0.0
      var i = 0
      while (i < n) {
        val lo = bytes(2 * i) & 0xFF
        val hi = bytes(2 * i + 1)
        val s: Int =
          if (fmt.isBigEndian) (((bytes(2 * i): Int) << 8) | (bytes(2 * i + 1) & 0xFF))
          else (((hi: Int) << 8) | lo)
        if (i == 0) first = s
        sum += s
        sumSq += s.toDouble * s
        if (s < min) min = s
        if (s > max) max = s
        i += 1
      }
      if (n == 0) { min = 0.0; max = 0.0 }
      Array(n.toDouble, fmt.getSampleRate.toDouble, fmt.getChannels.toDouble,
        sum, sumSq, min, max, first)
    } finally in.close()
  }
}

/** Image decode via `javax.imageio.ImageIO` — format-agnostic (BMP, PNG,
  * GIF, …: whatever ImageIO's installed readers detect from the magic
  * bytes). Emits exact per-channel integer stats of the decoded pixels.
  */
final class ImageRgbStatsCodec extends TolerantStatsCodec {

  /** [width, height, n_pixels, sum_r, sum_g, sum_b, min_r, max_r] */
  override val featureDim: Int = 8

  override protected def decodeOne(payload: Array[Byte]): Array[Double] = {
    // explicit MemoryCacheImageInputStream: the default ImageIO.read
    // path wraps the stream in a DISK-backed FileCacheImageInputStream
    // (a temp-file create/write/delete per row in the executor hot
    // loop, and an outright failure on a read-only tmpdir) — these
    // payloads are already in memory
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(payload))
    // NB ImageIO.read(ImageInputStream) closes the stream itself
    val img = javax.imageio.ImageIO.read(iis)
    require(img != null, "ImageIO found no reader for payload (not an image?)")
    val w = img.getWidth
    val h = img.getHeight
    var sumR = 0.0; var sumG = 0.0; var sumB = 0.0
    var minR = 255.0; var maxR = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >>> 16) & 0xFF
        val g = (rgb >>> 8) & 0xFF
        val b = rgb & 0xFF
        sumR += r; sumG += g; sumB += b
        if (r < minR) minR = r
        if (r > maxR) maxR = r
        x += 1
      }
      y += 1
    }
    Array(w.toDouble, h.toDouble, (w * h).toDouble, sumR, sumG, sumB, minR, maxR)
  }
}

/** Deterministic payload synthesis + independent container writers. The
  * writers are hand-rolled from the PUBLIC container specs (RIFF/WAVE,
  * Windows BITMAPINFOHEADER), deliberately NOT the same library that
  * decodes them — a systematic encode/decode error cannot cancel out, and
  * the DuckDB oracle recomputes the expected stats from the same integer
  * recipes, so the gate pins writer, container, and reader end to end.
  *
  * Recipes (all arithmetic is non-negative `%`, ids are non-negative):
  *  - audio: n = 64 + (id % 129) 16-bit mono samples at 8 kHz,
  *    s_i = (31·id + 7·i) % 65521 − 32760
  *  - image: w = 8 + (id % 9), h = 8 + (id % 7); pixel (x, y) has
  *    r = (id + 3x + 5y) % 256, g = (2·id + 7x + y) % 256,
  *    b = (5·id + x + 11·y) % 256
  */
object MediaSynth {

  val SampleRate = 8000

  def audioNumSamples(id: Long): Int = 64 + java.lang.Math.floorMod(id, 129L).toInt

  def audioSample(id: Long, i: Int): Int =
    java.lang.Math.floorMod(31L * id + 7L * i, 65521L).toInt - 32760

  def synthSamples(id: Long): Array[Int] =
    Array.tabulate(audioNumSamples(id))(audioSample(id, _))

  def imageDims(id: Long): (Int, Int) =
    (8 + java.lang.Math.floorMod(id, 9L).toInt, 8 + java.lang.Math.floorMod(id, 7L).toInt)

  def pixelRgb(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    java.lang.Math.floorMod(id + 3L * x + 5L * y, 256L).toInt,
    java.lang.Math.floorMod(2L * id + 7L * x + 1L * y, 256L).toInt,
    java.lang.Math.floorMod(5L * id + 1L * x + 11L * y, 256L).toInt)

  /** [[pixelRgb]] with a deterministic corner perturbation: pixels with
    * `x < 2 && y < 2` get `pert` added to every channel (mod 256) — the
    * recipe-level stand-in for a re-encode/crop artifact, so NEAR (not
    * just exact) duplicate images exist under distinct payload bytes.
    * `pert = 0` is exactly [[pixelRgb]].
    */
  def pixelRgbPerturbed(id: Long, pert: Long, x: Int, y: Int): (Int, Int, Int) =
    if (x < 2 && y < 2) (
      java.lang.Math.floorMod(id + 3L * x + 5L * y + pert, 256L).toInt,
      java.lang.Math.floorMod(2L * id + 7L * x + 1L * y + pert, 256L).toInt,
      java.lang.Math.floorMod(5L * id + 1L * x + 11L * y + pert, 256L).toInt)
    else pixelRgb(id, x, y)

  /** Canonical 44-byte RIFF/WAVE header + 16-bit little-endian PCM.
    * `samples` are interleaved when `channels > 1`.
    */
  def wavBytes(
      samples: Array[Int],
      sampleRate: Int = SampleRate,
      channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1) // PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * 2 * channels) // byte rate
    out.putShort((2 * channels).toShort) // block align
    out.putShort(16) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => out.putShort(s.toShort))
    out.array()
  }

  /** Deterministic garbage that no installed decoder accepts: a "GARB"
    * magic (not RIFF/FORM/.snd/BM/PNG) followed by recipe bytes. Stands
    * in for the corrupt files a real 100 TB media corpus always contains.
    */
  def corruptBytes(id: Long): Array[Byte] = {
    val n = 32 + java.lang.Math.floorMod(id, 17L).toInt
    val out = new Array[Byte](n)
    out(0) = 'G'; out(1) = 'A'; out(2) = 'R'; out(3) = 'B'
    var i = 4
    while (i < n) {
      out(i) = java.lang.Math.floorMod(13L * id + 7L * i, 251L).toByte
      i += 1
    }
    out
  }

  /** A WELL-FORMED stereo WAV (mono recipe interleaved with its negation):
    * the container parses fine, so [[WavPcmStatsCodec]] rejecting it
    * exercises the channel-layout check, not the RIFF parser.
    */
  def stereoWavPayload(id: Long): Array[Byte] = {
    val mono = synthSamples(id)
    val inter = new Array[Int](mono.length * 2)
    var i = 0
    while (i < mono.length) {
      inter(2 * i) = mono(i)
      inter(2 * i + 1) = -mono(i)
      i += 1
    }
    wavBytes(inter, SampleRate, channels = 2)
  }

  /** 24-bpp uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER),
    * bottom-up rows, BGR byte order, rows padded to 4 bytes.
    */
  def bmpBytes(id: Long): Array[Byte] = bmpBytesPerturbed(id, 0L)

  /** [[bmpBytes]] over [[pixelRgbPerturbed]] — same container, corner
    * region shifted by `pert`.
    */
  def bmpBytesPerturbed(id: Long, pert: Long): Array[Byte] = {
    val (w, h) = imageDims(id)
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataLen = rowBytes * h
    val out = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
    out.putShort(0).putShort(0).putInt(54) // reserved, pixel-data offset
    out.putInt(40).putInt(w).putInt(h) // info header, positive h = bottom-up
    out.putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
    out.putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixelRgbPerturbed(id, pert, x, y)
        out.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { out.put(0: Byte); pad -= 1 }
      y -= 1
    }
    out.array()
  }

  def wavPayload(id: Long): Array[Byte] = wavBytes(synthSamples(id))

  /** PNG encode of the SAME pixel recipe via ImageIO — lossless, so the
    * [[ImageRgbStatsCodec]] must decode it to identical stats as the
    * hand-rolled BMP (suite-pinned: the codec is container-agnostic).
    */
  def pngPayload(id: Long): Array[Byte] = {
    val (w, h) = imageDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixelRgb(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // memory-backed output stream for the same reason the codec reads
    // through MemoryCacheImageInputStream: no temp file per payload
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    bos.toByteArray
  }
}
