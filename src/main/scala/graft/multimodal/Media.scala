package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashing

/** Multimodal (binary) columns: images/audio/video ride as opaque
  * `binary` with typed metadata; per-modality decode/feature steps are
  * partition-parallel transforms (SURVEY §2.8 F2-F4; reference
  * /root/reference/src/media_fingerprinting.py).
  *
  * Image hashing is REAL (pure-JVM decode via javax.imageio +
  * deterministic area-average resample → dHash/aHash, 64-bit). Audio
  * fingerprints and video frame-sampling need codecs this container
  * does not ship — those run a clearly-marked deterministic stub so the
  * Spark plumbing (schema, batching, partitioning) is exercised
  * honestly.
  */
object Media {

  // ---------------------------------------------------------------- image

  /** Deterministic grayscale area-average downsample to w×h.
    * (PIL's default resample differs — fixture tests pin THIS one.)
    */
  private[multimodal] def resampleGray(img: BufferedImage, w: Int, h: Int): Array[Double] = {
    val out = new Array[Double](w * h)
    val sw = img.getWidth.toDouble / w
    val sh = img.getHeight.toDouble / h
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val x0 = math.floor(x * sw).toInt
        val x1 = math.max(x0 + 1, math.min(img.getWidth, math.ceil((x + 1) * sw).toInt))
        val y0 = math.floor(y * sh).toInt
        val y1 = math.max(y0 + 1, math.min(img.getHeight, math.ceil((y + 1) * sh).toInt))
        var sum = 0.0
        var n = 0
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) {
            val rgb = img.getRGB(xx, yy)
            val gray = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000.0
            sum += gray; n += 1
            xx += 1
          }
          yy += 1
        }
        out(y * w + x) = sum / n
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit difference hash: 9×8 grayscale, bit = (left < right). */
  def dhash64(bytes: Array[Byte]): Option[Long] =
    decode(bytes).map { img =>
      val g = resampleGray(img, 9, 8)
      var bits = 0L
      var i = 0
      for (y <- 0 until 8; x <- 0 until 8) {
        if (g(y * 9 + x) < g(y * 9 + x + 1)) bits |= (1L << i)
        i += 1
      }
      bits
    }

  /** 64-bit average hash: 8×8 grayscale, bit = (pixel ≥ mean). */
  def ahash64(bytes: Array[Byte]): Option[Long] =
    decode(bytes).map { img =>
      val g = resampleGray(img, 8, 8)
      val mean = g.sum / 64.0
      var bits = 0L
      var i = 0
      while (i < 64) { if (g(i) >= mean) bits |= (1L << i); i += 1 }
      bits
    }

  /** 64-bit perceptual (DCT) hash: 32×32 grayscale → 2D DCT-II → the
    * 8×8 low-frequency block → bit = (coefficient > median). The
    * imagehash.phash recipe (media_fingerprinting.py:144-146) on this
    * engine's deterministic resampler.
    */
  def phash64(bytes: Array[Byte]): Option[Long] =
    decode(bytes).map { img =>
      val n = 32
      val g = resampleGray(img, n, n)
      // 2D DCT-II via two 1D passes (rows then columns); only the first
      // 8 output coefficients per axis are ever used, so compute 8×8
      val low = 8
      val rowPass = Array.ofDim[Double](low, n) // rowPass(u)(y) = DCT over x of row y
      var u = 0
      while (u < low) {
        var y = 0
        while (y < n) {
          var acc = 0.0
          var x = 0
          while (x < n) {
            acc += g(y * n + x) * math.cos(math.Pi * u * (2 * x + 1) / (2.0 * n))
            x += 1
          }
          rowPass(u)(y) = acc
          y += 1
        }
        u += 1
      }
      val coeffs = new Array[Double](low * low)
      var v = 0
      while (v < low) {
        var u2 = 0
        while (u2 < low) {
          var acc = 0.0
          var y = 0
          while (y < n) {
            acc += rowPass(u2)(y) * math.cos(math.Pi * v * (2 * y + 1) / (2.0 * n))
            y += 1
          }
          coeffs(v * low + u2) = acc
          u2 += 1
        }
        v += 1
      }
      val sorted = coeffs.sorted
      val median = (sorted(31) + sorted(32)) / 2.0
      var bits = 0L
      var i = 0
      while (i < 64) { if (coeffs(i) > median) bits |= (1L << i); i += 1 }
      bits
    }

  /** 64-bit wavelet-style hash: 64×64 grayscale → 3-level 2D Haar
    * decomposition to the 8×8 LL band → bit = (value > median). The
    * whash idea (media_fingerprinting.py:147) without an external
    * wavelet dependency.
    */
  def whash64(bytes: Array[Byte]): Option[Long] =
    decode(bytes).map { img =>
      var size = 64
      var g = resampleGray(img, size, size)
      while (size > 8) {
        val half = size / 2
        val next = new Array[Double](half * half)
        var y = 0
        while (y < half) {
          var x = 0
          while (x < half) {
            next(y * half + x) = (
              g(2 * y * size + 2 * x) + g(2 * y * size + 2 * x + 1) +
                g((2 * y + 1) * size + 2 * x) + g((2 * y + 1) * size + 2 * x + 1)) / 4.0
            x += 1
          }
          y += 1
        }
        g = next
        size = half
      }
      val sorted = g.sorted
      val median = (sorted(31) + sorted(32)) / 2.0
      var bits = 0L
      var i = 0
      while (i < 64) { if (g(i) > median) bits |= (1L << i); i += 1 }
      bits
    }

  /** hash_type dispatch parity (media_fingerprinting.py:137-164):
    * dhash (reference default) | phash | ahash | whash. Unknown types
    * throw rather than silently fall back.
    */
  def imageHash(bytes: Array[Byte], hashType: String): Option[Long] = hashType match {
    case "dhash" => dhash64(bytes)
    case "phash" => phash64(bytes)
    case "ahash" => ahash64(bytes)
    case "whash" => whash64(bytes)
    case other => throw new IllegalArgumentException(s"unknown hash_type: $other")
  }

  private def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  val dhashUdf: UserDefinedFunction = udf((b: Array[Byte]) => if (b == null) None else dhash64(b))
  val ahashUdf: UserDefinedFunction = udf((b: Array[Byte]) => if (b == null) None else ahash64(b))
  val phashUdf: UserDefinedFunction = udf((b: Array[Byte]) => if (b == null) None else phash64(b))
  val whashUdf: UserDefinedFunction = udf((b: Array[Byte]) => if (b == null) None else whash64(b))

  /** Perceptual-hash similarity: 1 − dist/64 (media_fingerprinting.py:250-260). */
  def phashSimilarity(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    lit(1.0) - Hashing.hamming(a, b).cast("double") / 64.0

  // ----------------------------------------------------- audio (WAV/PCM)

  /** Decoded 16-bit PCM audio: first channel only (fingerprinting
    * needs one stream; the reference pipes everything through a mono
    * downmix anyway).
    */
  case class WavPcm(sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Short])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Dep-free RIFF/WAVE parse for uncompressed 16-bit PCM — the one
    * audio format that needs no codec (the reference shells out to
    * ffmpeg for the rest, media_fingerprinting.py:166-179; compressed
    * formats here still go through the documented stub path).
    *
    * Honest-failure contract: anything malformed — short header, wrong
    * magic, non-PCM format code, non-16-bit, or a declared chunk size
    * that overruns the payload — returns None rather than a best-effort
    * guess, mirroring [[decode]] for images.
    */
  def parseWav(bytes: Array[Byte]): Option[WavPcm] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None // truncated/overrun
      if (id == "fmt ") {
        if (size < 16) return None
        val audioFormat = le16(bytes, off + 8)
        val channels = le16(bytes, off + 10)
        val rate = le32(bytes, off + 12)
        val bits = le16(bytes, off + 22)
        if (audioFormat != 1 || channels < 1 || rate <= 0) return None // PCM only
        fmt = Some((channels, rate, bits))
      } else if (id == "data") {
        data = Some((off + 8, size))
      }
      off += 8 + size + (size & 1) // RIFF chunks pad to even
    }
    for {
      (ch, rate, bits) <- fmt
      (dOff, dLen) <- data
      if bits == 16
    } yield {
      val frameBytes = 2 * ch
      val n = dLen / frameBytes
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        out(i) = le16(bytes, dOff + i * frameBytes).toShort
        i += 1
      }
      WavPcm(rate, ch, bits, out)
    }
  }

  /** Canonical 44-byte-header WAV writer (mono-interleaved raw data
    * bytes in, RIFF container out) — the test/builder twin of
    * [[parseWav]]; also how the m03 query rides document bytes through
    * the REAL parser.
    */
  def buildWav(sampleRate: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val n = data.length - (data.length % 2)
    val out = java.nio.ByteBuffer.allocate(44 + n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n).put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(n).put(data, 0, n)
    out.array()
  }

  /** Per-window dominant-frequency bins: rectangular-window DFT
    * magnitude argmax over bins 1..window/2−1 (DC excluded), ties to
    * the lower bin. StrictMath keeps the trigonometry bit-identical
    * across JVMs. Direct DFT, not FFT — windows are tiny (256) and the
    * per-row work stays linear in samples × window.
    */
  private[graft] def spectralPeaks(
      samples: Array[Short], window: Int = 256, hop: Int = 128): Array[Int] = {
    if (samples.length < window) return Array.empty
    // cos/sin lookup by (k*i) mod window — exact same StrictMath values
    // as computing each angle directly, one table instead of n² calls
    val cosT = Array.tabulate(window)(m => StrictMath.cos(2.0 * StrictMath.PI * m / window))
    val sinT = Array.tabulate(window)(m => StrictMath.sin(2.0 * StrictMath.PI * m / window))
    val nWin = (samples.length - window) / hop + 1
    val peaks = new Array[Int](nWin)
    var w = 0
    while (w < nWin) {
      val base = w * hop
      var bestK = 1
      var bestMag = -1.0
      var k = 1
      while (k < window / 2) {
        var re = 0.0
        var im = 0.0
        var i = 0
        while (i < window) {
          val m = (k * i) % window
          val x = samples(base + i).toDouble
          re += x * cosT(m)
          im -= x * sinT(m)
          i += 1
        }
        val mag = re * re + im * im
        if (mag > bestMag) { bestMag = mag; bestK = k }
        k += 1
      }
      peaks(w) = bestK
      w += 1
    }
    peaks
  }

  /** 60-bit-ish audio fingerprint: modular rolling hash over the
    * window peak-bin sequence (same base-31 family as the text
    * fingerprints, so downstream hamming/equality tooling applies).
    * None for anything [[parseWav]] rejects AND for clips shorter than
    * one analysis window — a degenerate clip has no spectral content to
    * fingerprint, and a constant value would alias all of them as
    * mutual duplicates.
    */
  def wavFingerprint(bytes: Array[Byte], window: Int = 256, hop: Int = 128): Option[Long] =
    parseWav(bytes).flatMap { pcm =>
      val peaks = spectralPeaks(pcm.samples, window, hop)
      // a clip shorter than one analysis window yields no peaks; a
      // constant fingerprint would make every degenerate clip a mutual
      // duplicate in any downstream equality join — report "no
      // fingerprint" instead
      if (peaks.isEmpty) None
      else {
        var h = 1L
        var i = 0
        while (i < peaks.length) { h = (h * 31 + (peaks(i) + 1)) % 2147483647L; i += 1 }
        Some(h)
      }
    }

  val wavFingerprintUdf: UserDefinedFunction =
    udf((b: Array[Byte]) => if (b == null) None else wavFingerprint(b))

  /** Integer WAV features for the oracle gate (every value replayable
    * by DuckDB from the raw byte stream): sample count, header sample
    * rate, sign-change count, Σ|sample|, and a base-31 rolling hash of
    * the unsigned sample stream (seed 1, mod 2^31−1).
    */
  private[graft] def wavIntFeatures(pcm: WavPcm): (Int, Int, Int, Long, Long) = {
    val s = pcm.samples
    var zc = 0
    var absSum = 0L
    var h = 1L
    var i = 0
    while (i < s.length) {
      if (i > 0 && ((s(i - 1) >= 0) != (s(i) >= 0))) zc += 1
      absSum += math.abs(s(i).toLong)
      h = (h * 31 + (s(i) & 0xffff)) % 2147483647L
      i += 1
    }
    (s.length, pcm.sampleRate, zc, absSum, h)
  }

  // ------------------------------------------------------- generic binary

  // ---------------------------------------------------------------- video

  /** Temporal perceptual hash of a video payload — the F4 pipeline
    * shape of the reference's VideoHash (frame-sample → per-frame
    * perceptual hash → temporal combine; the `videohash` library
    * extracts frames with ffmpeg, tiles a collage and wavelet-hashes
    * it, media_fingerprinting.py:166-179; the reference consumes the
    * result only as opaque equality/similarity).
    *
    * Stage 1 — FRAME SAMPLING — dispatches on the container:
    *
    *  - **Y4M (YUV4MPEG2)** payloads are REALLY decoded: the framed
    *    container is parsed ([[parseY4m]] — header geometry, per-frame
    *    `FRAME` markers, planar YUV layout), `nFrames` frames are
    *    sampled at even temporal stride (frame w·F/n), and each
    *    sampled frame's LUMA plane is the genuine grayscale image the
    *    per-frame hash runs on (an 8×8 even-stride spatial resample —
    *    the exact [[ahash64]] geometry). No codec library needed:
    *    Y4M is raw planar video, the interchange format ffmpeg itself
    *    emits (`-f yuv4mpegpipe`).
    *  - **MJPEG-in-AVI** payloads are REALLY decoded too: the RIFF
    *    container is walked structurally ([[parseAviFrames]] — `movi`
    *    LIST, `##dc`/`##db` video chunks, nested `rec ` lists, even
    *    padding), `nFrames` frame chunks are sampled at even temporal
    *    stride, and each is JPEG-decoded via `javax.imageio` (in the
    *    JDK — still dependency-free). The decoded frame is sampled on
    *    the same 8×8 even-stride grid as the Y4M path (gray = band 0
    *    for grayscale JPEGs, integer BT.601 `(299r+587g+114b)/1000`
    *    otherwise). MJPEG is the one compressed codec whose frames
    *    are standalone JPEGs, so no codec library is needed.
    *  - any OTHER payload (compressed codecs this container cannot
    *    decode) falls back to the documented deterministic stand-in:
    *    "frame" w is the byte window [w·len/n, (w+1)·len/n), resampled
    *    to 64 "pixels" by even stride. A structurally invalid Y4M
    *    (truncated frame, bad geometry), a structurally invalid AVI,
    *    and an AVI whose sampled frames are not decodable JPEGs
    *    (DivX/Xvid/... fourccs) also take this path — a content hash
    *    beats a killed 100 TB job, and the reference consumes the
    *    value as opaque equality only.
    *
    * Stage 2 — per-frame average-hash: bit j is set iff pixel j
    * exceeds the integer mean of the 64 pixels.
    *
    * Stage 3 — temporal combine: majority vote per bit across frames
    * (bit set iff > nFrames/2 frames set it) — the robustness property
    * the collage wavelet buys, as portable integer arithmetic.
    *
    * 60 bits, not 64 — the [[graft.functions.Hashing.simhash60]]
    * convention: the value stays positive in any SQL BIGINT, so the
    * m04/m05 DuckDB oracles replay every bit (m04 from the blob's hex
    * dump, m05 from the fixture's pixel formula) and hamming distance
    * works unsigned everywhere. Empty/null payloads hash to 0.
    */
  def videoHash60(bytes: Array[Byte], nFrames: Int = 8): Long = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    if (bytes == null || bytes.isEmpty) return 0L
    parseY4m(bytes) match {
      case Some(y4m) => y4mHash60(bytes, y4m, nFrames)
      case None =>
        parseAviFrames(bytes).flatMap(aviHash60(bytes, _, nFrames))
          .getOrElse(byteWindowHash60(bytes, nFrames))
    }
  }

  /** Parsed Y4M geometry: luma width/height and the byte offset of
    * each frame's luma plane.
    */
  private[graft] final case class Y4m(
      width: Int, height: Int, lumaOffsets: Array[Int])

  /** Structural Y4M parse — `None` for non-Y4M payloads AND for
    * malformed ones (truncation, bad geometry, unknown colorspace):
    * the caller's fallback is the content-hash path, so parse failure
    * degrades deterministically instead of throwing mid-scan.
    */
  private[graft] def parseY4m(bytes: Array[Byte]): Option[Y4m] = {
    val magic = "YUV4MPEG2".getBytes("US-ASCII")
    if (bytes.length < magic.length + 1) return None
    var i = 0
    while (i < magic.length) { if (bytes(i) != magic(i)) return None; i += 1 }
    val headerEnd = bytes.indexOf('\n'.toByte)
    if (headerEnd < 0) return None
    val header = new String(bytes, 0, headerEnd, "US-ASCII")
    var w = 0; var h = 0; var cs = "420"
    for (tok <- header.split(' ').drop(1); if tok.nonEmpty) tok.charAt(0) match {
      case 'W' => w = tok.drop(1).toIntOption.getOrElse(0)
      case 'H' => h = tok.drop(1).toIntOption.getOrElse(0)
      case 'C' => cs = tok.drop(1)
      case _ => () // F (rate), I (interlace), A (aspect), X (comment): irrelevant to geometry
    }
    // geometry bound BEFORE any plane-size arithmetic: a corrupt
    // header like W65536 H65536 would overflow w*h in Int (2^32 → 0),
    // letting `pos` step backward and loop forever. 64 Mpx ≫ any real
    // frame; larger claims are treated as malformed (fallback path).
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    val luma = w * h
    val chroma =
      if (cs.startsWith("420")) { if (w % 2 != 0 || h % 2 != 0) return None else (w / 2) * (h / 2) * 2 }
      else if (cs.startsWith("422")) { if (w % 2 != 0) return None else (w / 2) * h * 2 }
      else if (cs.startsWith("444")) luma * 2
      else if (cs.startsWith("mono")) 0
      else return None
    val frameMagic = "FRAME".getBytes("US-ASCII")
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var pos = headerEnd + 1
    while (pos < bytes.length) {
      if (pos + frameMagic.length > bytes.length) return None
      var j = 0
      while (j < frameMagic.length) {
        if (bytes(pos + j) != frameMagic(j)) return None
        j += 1
      }
      var nl = pos + frameMagic.length
      while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
      if (nl >= bytes.length) return None
      val lumaOff = nl + 1
      if (lumaOff.toLong + luma + chroma > bytes.length) return None
      offs += lumaOff
      pos = lumaOff + luma + chroma
    }
    if (offs.isEmpty) None else Some(Y4m(w, h, offs.toArray))
  }

  /** Stages 2-3 over REAL Y4M frames: sample nFrames at even temporal
    * stride, 8×8 even-stride spatial resample of each sampled frame's
    * luma plane, per-frame mean threshold, majority vote.
    */
  private def y4mHash60(bytes: Array[Byte], y4m: Y4m, nFrames: Int): Long = {
    val nF = y4m.lumaOffsets.length
    val votes = new Array[Int](60)
    var w = 0
    while (w < nFrames) {
      val off = y4m.lumaOffsets((w.toLong * nF / nFrames).toInt)
      val px = new Array[Int](64)
      var j = 0
      var sum = 0L
      while (j < 64) {
        val row = (j / 8) * y4m.height / 8
        val colIdx = (j % 8) * y4m.width / 8
        px(j) = bytes(off + row * y4m.width + colIdx) & 0xff
        sum += px(j)
        j += 1
      }
      val mean = sum / 64 // integer floor, SQL-replayable
      j = 0
      while (j < 60) {
        if (px(j) > mean) votes(j) += 1
        j += 1
      }
      w += 1
    }
    majority60(votes, nFrames)
  }

  /** Structural RIFF/AVI walk — the byte ranges of the video frame
    * chunks (`##dc` compressed / `##db` uncompressed, any stream
    * digits) inside the `movi` LIST, in container order, recursing
    * into `rec ` sub-lists (interleaved-AVI grouping) and honoring
    * RIFF's even-size padding. `None` for non-AVI payloads AND for
    * structurally malformed ones (truncated chunk, size overrunning
    * the buffer, no movi list, zero frames): the caller's fallback is
    * the content-hash path, so parse failure degrades
    * deterministically instead of throwing mid-scan ([[parseY4m]]'s
    * contract; ref media_fingerprinting.py:166-179 shells out to
    * ffmpeg for the same job).
    *
    * The codec itself is NOT validated here — that happens at decode
    * time ([[aviHash60]]): an AVI carrying DivX/Xvid frames parses
    * structurally but its chunks fail JPEG decode, sending the whole
    * payload down the documented fallback.
    */
  private[graft] def parseAviFrames(bytes: Array[Byte]): Option[Array[(Int, Int)]] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
      return None
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // walk one chunk sequence [pos, end); returns false on structural
    // violation anywhere below (propagated up — one bad size refuses
    // the whole container)
    def walk(start: Int, end: Int, inMovi: Boolean): Boolean = {
      var pos = start
      while (pos < end) {
        if (pos + 8 > end) return false
        val id = tag(bytes, pos)
        val size = le32(bytes, pos + 4)
        if (size < 0 || pos + 8 + size.toLong > end) return false
        val dataOff = pos + 8
        if (id == "LIST") {
          if (size < 4) return false
          val listType = tag(bytes, dataOff)
          val listMovi = listType == "movi" || (inMovi && listType == "rec ")
          if (!walk(dataOff + 4, dataOff + size, inMovi = listMovi)) return false
        } else if (inMovi && id.length == 4 &&
            id(0).isDigit && id(1).isDigit &&
            id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')) {
          frames += ((dataOff, size))
        }
        pos = dataOff + size + (size & 1) // RIFF pads chunks to even
      }
      true
    }
    val riffSize = le32(bytes, 4)
    if (riffSize < 4 || 8 + riffSize.toLong > bytes.length) return None
    if (!walk(12, 8 + riffSize, inMovi = false) || frames.isEmpty) None
    else Some(frames.toArray)
  }

  /** Stages 2-3 over decoded MJPEG frames: sample nFrames chunks at
    * even temporal stride, JPEG-decode each, 8×8 even-stride spatial
    * sample of the decoded image (band 0 for grayscale, integer
    * BT.601 luma otherwise), per-frame mean threshold, majority vote —
    * the [[y4mHash60]] pipeline with `javax.imageio` standing in for
    * the raw-plane read. `None` when ANY sampled chunk fails to
    * decode (wrong codec, corrupt JPEG) or is degenerate (<8×8): the
    * hash is either fully decode-based or fully content-based, never
    * a silent mix.
    */
  private def aviHash60(
      bytes: Array[Byte], frames: Array[(Int, Int)], nFrames: Int): Option[Long] = {
    val nF = frames.length
    val votes = new Array[Int](60)
    var w = 0
    while (w < nFrames) {
      val (off, len) = frames((w.toLong * nF / nFrames).toInt)
      val img = decode(java.util.Arrays.copyOfRange(bytes, off, off + len))
        .getOrElse(return None)
      val (iw, ih) = (img.getWidth, img.getHeight)
      if (iw < 8 || ih < 8) return None
      val gray = img.getRaster.getNumBands == 1
      val px = new Array[Int](64)
      var j = 0
      var sum = 0L
      while (j < 64) {
        val row = (j / 8) * ih / 8
        val colIdx = (j % 8) * iw / 8
        px(j) =
          if (gray) img.getRaster.getSample(colIdx, row, 0)
          else {
            val rgb = img.getRGB(colIdx, row)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            (299 * r + 587 * g + 114 * b) / 1000
          }
        sum += px(j)
        j += 1
      }
      val mean = sum / 64 // integer floor, SQL-replayable
      j = 0
      while (j < 60) {
        if (px(j) > mean) votes(j) += 1
        j += 1
      }
      w += 1
    }
    Some(majority60(votes, nFrames))
  }

  /** The non-Y4M fallback: stages 2-3 over even byte windows (the
    * documented codec stand-in — see [[videoHash60]]).
    */
  private def byteWindowHash60(bytes: Array[Byte], nFrames: Int): Long = {
    val n = bytes.length
    val votes = new Array[Int](60)
    var w = 0
    while (w < nFrames) {
      val s = (w.toLong * n / nFrames).toInt
      val e = ((w + 1).toLong * n / nFrames).toInt
      val wlen = e - s
      if (wlen > 0) {
        val px = new Array[Int](64)
        var j = 0
        var sum = 0L
        while (j < 64) {
          px(j) = bytes(s + (j.toLong * wlen / 64).toInt) & 0xff
          sum += px(j)
          j = 1 + j
        }
        val mean = sum / 64 // integer floor, SQL-replayable
        j = 0
        while (j < 60) {
          if (px(j) > mean) votes(j) += 1
          j += 1
        }
      }
      w += 1
    }
    majority60(votes, nFrames)
  }

  private def majority60(votes: Array[Int], nFrames: Int): Long = {
    var h = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) * 2 > nFrames) h |= 1L << j
      j += 1
    }
    h
  }

  /** Column form of [[videoHash60]] — the native codegen Expression
    * ([[graft.functions.expr.VideoHash60]]; also `video_hash60` in
    * SQL), so the temporal hash runs inside whole-stage codegen instead
    * of through UDF serialization. Bit-parity with the Scala form is
    * property-spec pinned.
    */
  def videoHash60Col(content: org.apache.spark.sql.Column, nFrames: Int = 8): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.expr.VideoHash60(
        org.apache.spark.sql.GraftColumnShim.expression(content), nFrames))

  /** [[videoHash60Col]] with a precomputed-hash escape hatch — the
    * scale path for codecs the JVM cannot decode (H.264 and friends,
    * SURVEY §2.8 F3): a corpus hashed ffmpeg-side carries its hashes
    * in a column, and rows where `precomputed` is non-null use it
    * VERBATIM and never touch the payload — `coalesce` short-circuits
    * in codegen, so the decode expression is not evaluated for those
    * rows, not merely overridden. Rows without one fall through to
    * the real decode-and-hash path (Y4M / MJPEG-AVI / content-hash
    * fallback), so mixed corpora — some codecs decodable in the JVM,
    * some hashed upstream — run in ONE pass with one output column.
    */
  def videoHash60OrPrecomputed(
      content: org.apache.spark.sql.Column,
      precomputed: org.apache.spark.sql.Column,
      nFrames: Int = 8): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.coalesce(
      precomputed.cast("long"), videoHash60Col(content, nFrames))

  /** Canonical multimodal schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video|binary
    StructField("mime", StringType, nullable = true),
    StructField("content", BinaryType, nullable = true)))

  /** Feature-extraction output schema. (The float-array width is a
    * runtime property of the extractor, not something StructType can
    * encode — the `dim` parameter exists only so call sites document
    * which width they expect.)
    */
  def featureSchema(dim: Int): StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB — deterministic fake feature extractor standing in for a real
    * audio/video decode (codec libraries are not present in this
    * environment). Produces `dim` floats derived from a rolling byte
    * hash, so outputs are stable across runs/partitionings and the
    * real concerns — batch iteration, schema, partition parallelism,
    * null payloads — are genuinely exercised. Swap `fakeFeatures` with
    * a real decoder per modality in production.
    *
    * The fold is MODULAR (base-31 rolling hash mod 2^31−1, then an LCG
    * step per dim, feature = (h mod 4096)/4096) rather than wrapping
    * int64: every intermediate fits SQL BIGINT and n/4096 is exactly
    * representable in float32, so a DuckDB oracle replays the values
    * bit-for-bit (the m02 gate) — the stub's plumbing AND its numbers
    * are cross-engine checked.
    */
  private[multimodal] def fakeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val P = 2147483647L
    val out = new Array[Float](dim)
    var h = 1L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % P; i += 1 }
    var j = 0
    while (j < dim) {
      h = (h * 1103515245L + 12345L) % P
      out(j) = (h % 4096).toFloat / 4096.0f // exact: n/2^12, n < 2^12
      j += 1
    }
    out
  }

  /** Partition-parallel decode/feature pass over a media frame
    * (mediaSchema → featureSchema). mapPartitions keeps per-partition
    * decoder setup amortized — the same shape a Pandas-UDF
    * `mapInPandas` would have in PySpark.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema(dim))
    media.select("media_id", "modality", "content").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val bytes = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
        Row(id, modality, bytes.length, fakeFeatures(bytes, dim).toSeq)
      }
    }(enc)
  }
}
