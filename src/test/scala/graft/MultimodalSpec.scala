package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.multimodal.Media

/** Real perceptual hashing on generated PNGs + stubbed feature-extract
  * plumbing over binary columns.
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  /** Render a deterministic test image: left-to-right gradient with an
    * optional blob; near-identical images must land within small
    * hamming distance, different images far.
    */
  private def png(w: Int, h: Int, vertical: Boolean, noise: Int = 0): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = if (vertical) (y * 255) / h else (x * 255) / w
      val v = math.min(255, base + noise * ((x + y) % 2))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dhash: identical images → distance 0; tiny noise → near; different → far") {
    val a = Media.dhash64(png(64, 48, vertical = false)).get
    val a2 = Media.dhash64(png(64, 48, vertical = false, noise = 4)).get
    val b = Media.dhash64(png(64, 48, vertical = true)).get
    def d(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(d(a, a) == 0)
    assert(d(a, a2) <= 6, s"noisy pair too far: ${d(a, a2)}")
    assert(d(a, b) > 6, s"different pair too near: ${d(a, b)}")
  }

  test("ahash produces a valid 64-bit code and matches itself") {
    val h1 = Media.ahash64(png(32, 32, vertical = true)).get
    val h2 = Media.ahash64(png(32, 32, vertical = true)).get
    assert(h1 == h2)
  }

  test("phash: deterministic, robust to tiny noise, separates different images") {
    val a = Media.phash64(png(64, 48, vertical = false)).get
    val a1 = Media.phash64(png(64, 48, vertical = false)).get
    val a2 = Media.phash64(png(64, 48, vertical = false, noise = 4)).get
    val b = Media.phash64(png(64, 48, vertical = true)).get
    def d(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(a == a1)
    assert(d(a, a2) <= 8, s"noisy pair too far: ${d(a, a2)}")
    assert(d(a, b) > 8, s"different pair too near: ${d(a, b)}")
    // DCT hash must be scale-robust: the same gradient at half size
    assert(d(a, Media.phash64(png(32, 24, vertical = false)).get) <= 8)
  }

  test("whash: deterministic and separates different images") {
    val a = Media.whash64(png(64, 48, vertical = false)).get
    val b = Media.whash64(png(64, 48, vertical = true)).get
    assert(a == Media.whash64(png(64, 48, vertical = false)).get)
    assert(java.lang.Long.bitCount(a ^ b) > 8)
  }

  test("imageHash dispatches on hash_type and rejects unknown types") {
    val bytes = png(32, 32, vertical = false)
    assert(Media.imageHash(bytes, "dhash") == Media.dhash64(bytes))
    assert(Media.imageHash(bytes, "phash") == Media.phash64(bytes))
    assert(Media.imageHash(bytes, "ahash") == Media.ahash64(bytes))
    assert(Media.imageHash(bytes, "whash") == Media.whash64(bytes))
    intercept[IllegalArgumentException](Media.imageHash(bytes, "xhash"))
  }

  test("corrupt bytes decode to None, not an exception") {
    assert(Media.dhash64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("dhash UDF + similarity over a media DataFrame") {
    val rows = Seq(
      (1L, png(64, 48, vertical = false)),
      (2L, png(64, 48, vertical = false, noise = 4)),
      (3L, png(64, 48, vertical = true)))
    val df = rows.toDF("media_id", "content")
      .withColumn("dhash", Media.dhashUdf(col("content")))
    val pairs = df.as("a").join(df.as("b"), col("a.media_id") < col("b.media_id"))
      .select(
        col("a.media_id"), col("b.media_id"),
        Media.phashSimilarity(col("a.dhash"), col("b.dhash")).as("sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) >= 0.9)
    assert(pairs((1L, 3L)) < pairs((1L, 2L)))
  }

  test("feature extraction plumbing: schema, determinism, null payloads") {
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "audio", "audio/wav", Array[Byte](1, 2, 3, 4)),
        Row(2L, "video", "video/mp4", Array[Byte](9, 9, 9)),
        Row(3L, "audio", null, null))),
      Media.mediaSchema)
    val f1 = Media.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getSeq[Float](3))).toMap
    val f2 = Media.extractFeatures(media.repartition(3), dim = 8).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getSeq[Float](3))).toMap
    assert(f1.keySet == Set(1L, 2L, 3L))
    assert(f1(1L)._2.length == 8)
    assert(f1(3L)._1 == 0) // null payload → empty bytes, still a row
    assert(f1 == f2) // partitioning-independent determinism
  }

  // ----------------------------------------------------- audio (WAV/PCM)

  /** 16-bit mono sine WAV: amplitude 0.5 full-scale at `hz`. */
  private def sineWav(hz: Double, rate: Int, seconds: Double, channels: Int = 1): Array[Byte] = {
    val n = (rate * seconds).toInt
    val buf = java.nio.ByteBuffer.allocate(n * 2 * channels)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until n; _ <- 0 until channels)
      buf.putShort((16000 * math.sin(2 * math.Pi * hz * i / rate)).toShort)
    Media.buildWav(rate, channels, buf.array())
  }

  test("parseWav: header round-trip, sample extraction, honest failures") {
    val data = Array[Byte](0x10, 0x00, 0xf0.toByte, 0xff.toByte, 0x00, 0x80.toByte)
    val wav = Media.buildWav(8000, 1, data)
    val pcm = Media.parseWav(wav).get
    assert(pcm.sampleRate == 8000 && pcm.channels == 1 && pcm.bitsPerSample == 16)
    // LE pairs: 0x0010=16, 0xfff0=-16, 0x8000=-32768
    assert(pcm.samples.toSeq == Seq[Short](16, -16, -32768))
    // stereo: only channel 0 survives
    val st = Media.parseWav(sineWav(440, 8000, 0.01, channels = 2)).get
    assert(st.channels == 2 && st.samples.length == 80)
    // failures: truncated payload, bad magic, not a WAV at all
    assert(Media.parseWav(wav.dropRight(3)) == None, "declared size overruns payload")
    val badMagic = wav.clone(); badMagic(9) = 'X'.toByte
    assert(Media.parseWav(badMagic) == None)
    assert(Media.parseWav("not audio".getBytes) == None)
    assert(Media.parseWav(null) == None)
    // empty data chunk parses to zero samples (44-byte minimal file)
    assert(Media.parseWav(Media.buildWav(8000, 1, Array.empty)).get.samples.isEmpty)
  }

  test("spectralPeaks: pure tones land on their DFT bin; dominance switches") {
    // 440 Hz at 8 kHz, window 256 → bin 440*256/8000 = 14.08 → argmax 14
    val a = Media.parseWav(sineWav(440, 8000, 0.5)).get
    val pa = Media.spectralPeaks(a.samples)
    assert(pa.nonEmpty && pa.forall(_ == 14), s"440 Hz peaks: ${pa.distinct.toSeq}")
    // 2 kHz → bin 64 exactly (no leakage at all)
    val b = Media.parseWav(sineWav(2000, 8000, 0.5)).get
    assert(Media.spectralPeaks(b.samples).forall(_ == 64))
    // shorter than one window → no peaks
    assert(Media.spectralPeaks(Array.fill[Short](100)(5)).isEmpty)
  }

  test("wavFingerprint: deterministic, discriminates tones, None on non-WAV") {
    val f440 = Media.wavFingerprint(sineWav(440, 8000, 0.3))
    val f2k = Media.wavFingerprint(sineWav(2000, 8000, 0.3))
    assert(f440.isDefined && f2k.isDefined && f440 != f2k)
    assert(Media.wavFingerprint(sineWav(440, 8000, 0.3)) == f440) // stable
    assert(Media.wavFingerprint("mp3 garbage".getBytes) == None)
    // sub-window clip → no fingerprint (a constant would collide all
    // degenerate clips as mutual duplicates), not a crash
    assert(Media.wavFingerprint(sineWav(440, 8000, 0.01)) == None)
    // UDF surface over a frame
    import spark.implicits._
    val df = Seq((1L, sineWav(440, 8000, 0.3)), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "content")
      .select(col("id"), Media.wavFingerprintUdf(col("content")).as("fp"))
    val m = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(m(1L) == Some(f440.get) && m(2L) == None)
  }

  test("videoHash60: deterministic, 60-bit positive, empty/null → 0") {
    val rnd = new scala.util.Random(7)
    val payload = Array.fill(4096)(rnd.nextInt(256).toByte)
    val h = Media.videoHash60(payload)
    assert(h == Media.videoHash60(payload.clone()), "not deterministic")
    assert(h >= 0L && h < (1L << 60), s"hash $h outside the 60-bit positive range")
    assert(Media.videoHash60(Array.empty[Byte]) == 0L)
    assert(Media.videoHash60(null) == 0L)
  }

  test("videoHash60OrPrecomputed: precomputed hash wins; decode runs only when absent") {
    val rnd = new scala.util.Random(11)
    val payload = Array.fill(4096)(rnd.nextInt(256).toByte)
    val decoded = Media.videoHash60(payload)
    val rows = Seq(
      (1L, payload, Some(42L)), // upstream hash present: passthrough
      (2L, payload, None), // absent: real decode path
      (3L, null.asInstanceOf[Array[Byte]], Some(7L)), // no payload at all — an
      // H.264 corpus may carry ONLY hashes; coalesce never touches content
      (4L, null.asInstanceOf[Array[Byte]], None) // nothing: null-safe 0
    ).toDF("media_id", "payload", "pre_hash")
    val got = rows
      .select(col("media_id"),
        Media.videoHash60OrPrecomputed(col("payload"), col("pre_hash")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 42L, 2L -> decoded, 3L -> 7L, 4L -> 0L))
    // 42 is nothing videoHash60 would produce on this payload — the
    // passthrough is precedence, not coincidence
    assert(decoded !== 42L)
  }

  test("videoHash60: majority vote across frames survives one corrupted frame") {
    // 8 identical "frames" (byte windows): every frame votes the same
    // bits, so the temporal hash IS the per-frame hash. Corrupting ONE
    // frame leaves a 7-of-8 majority — the hash must not move. That is
    // the robustness property the reference's collage hash buys
    // (a few bad frames don't change the video's identity).
    val rnd = new scala.util.Random(13)
    val frame = Array.fill(512)(rnd.nextInt(256).toByte)
    val clean = Array.fill(8)(frame).flatten
    val corrupted = clean.clone()
    val noise = new scala.util.Random(99)
    // stomp frame 3 entirely
    for (i <- (3 * 512) until (4 * 512)) corrupted(i) = noise.nextInt(256).toByte
    val hClean = Media.videoHash60(clean)
    assert(hClean == Media.videoHash60(corrupted),
      "one corrupted frame out of eight changed the temporal hash — majority vote broken")
    // sanity: unrelated content separates (not a constant function)
    val other = Array.fill(4096)(noise.nextInt(256).toByte)
    assert(hClean != Media.videoHash60(other), "hash failed to separate unrelated payloads")
  }

  test("videoHash60: nFrames=1 degenerates to the single-frame average-hash") {
    val rnd = new scala.util.Random(21)
    val payload = Array.fill(777)(rnd.nextInt(256).toByte)
    // with one frame the majority threshold is >1/2 of 1 vote: the
    // temporal combine is the identity on the per-frame bits
    val h1 = Media.videoHash60(payload, nFrames = 1)
    assert(h1 >= 0L && h1 < (1L << 60))
    assert(h1 == Media.videoHash60(payload, nFrames = 1))
  }

  // ---- real Y4M container path --------------------------------------

  /** 2-frame-pattern Y4M builder: frame f's luma is lumaOf(f); chroma
    * planes carry `chromaFill`. Plain or param-decorated FRAME markers.
    */
  private def y4m(
      w: Int, h: Int, frames: Seq[Array[Byte]],
      chromaFill: Int = 128, frameParams: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F30:1 C420\n".getBytes("US-ASCII"))
    for (f <- frames) {
      require(f.length == w * h)
      out.write(s"FRAME$frameParams\n".getBytes("US-ASCII"))
      out.write(f)
      var k = 0
      while (k < (w / 2) * (h / 2) * 2) { out.write(chromaFill); k += 1 }
    }
    out.toByteArray
  }

  test("Y4M: real frames are decoded — chroma is ignored, luma drives the hash") {
    val rnd = new scala.util.Random(31)
    val frames = (0 until 10).map(_ => Array.fill(32 * 24)(rnd.nextInt(256).toByte))
    val a = Media.videoHash60(y4m(32, 24, frames, chromaFill = 128))
    // identical luma, completely different chroma → identical hash
    // (the byte-window stub could NOT do this: it reads chroma bytes)
    val b = Media.videoHash60(y4m(32, 24, frames, chromaFill = 7))
    assert(a == b, "chroma bytes leaked into the luma hash — plane offsets wrong")
    // inverting the luma flips the hash
    val inv = frames.map(_.map(v => (255 - (v & 0xff)).toByte))
    assert(a != Media.videoHash60(y4m(32, 24, inv)), "luma inversion did not move the hash")
    // FRAME parameter decorations parse like plain markers
    val c = Media.videoHash60(y4m(32, 24, frames, frameParams = " Xsome_param"))
    assert(a == c, "FRAME params changed the hash — marker line not consumed to newline")
    // deterministic
    assert(a == Media.videoHash60(y4m(32, 24, frames)))
  }

  test("Y4M: majority vote across real frames survives corrupted frames") {
    val rnd = new scala.util.Random(41)
    val frame = Array.fill(32 * 24)(rnd.nextInt(256).toByte)
    val clean = (0 until 8).map(_ => frame)
    val noisy = new scala.util.Random(43)
    val oneBad = clean.updated(3, Array.fill(32 * 24)(noisy.nextInt(256).toByte))
    assert(Media.videoHash60(y4m(32, 24, clean)) == Media.videoHash60(y4m(32, 24, oneBad)),
      "one corrupted frame of eight changed the temporal hash")
  }

  test("Y4M: malformed containers degrade to the deterministic content hash, never throw") {
    val rnd = new scala.util.Random(53)
    val frames = (0 until 4).map(_ => Array.fill(16 * 16)(rnd.nextInt(256).toByte))
    val good = y4m(16, 16, frames)
    // truncate mid-frame: structurally invalid → byte-window fallback
    val truncated = good.take(good.length - 100)
    val ht = Media.videoHash60(truncated)
    assert(ht == Media.videoHash60(truncated.clone()), "fallback not deterministic")
    assert(ht >= 0 && ht < (1L << 60))
    // a Y4M header with garbage geometry → fallback, no exception
    val badGeom = "YUV4MPEG2 W0 H16 C420\nFRAME\n".getBytes("US-ASCII") ++ Array.fill(999)(1.toByte)
    assert(Media.videoHash60(badGeom) >= 0)
    // odd dimensions are invalid for C420 → fallback
    val badDim = "YUV4MPEG2 W15 H15 C420\nFRAME\n".getBytes("US-ASCII") ++ Array.fill(400)(1.toByte)
    assert(Media.videoHash60(badDim) >= 0)
    // w*h Int-overflow header (65536² = 2^32 → 0) must be rejected,
    // not loop forever on a backward-stepping frame walk
    val overflow = "YUV4MPEG2 W65536 H65536 C420\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill(4096)(2.toByte)
    assert(Media.videoHash60(overflow) >= 0)
    assert(Media.parseY4m(overflow).isEmpty)
    // and the parser itself reports None for each
    assert(Media.parseY4m(truncated).isEmpty)
    assert(Media.parseY4m(badGeom).isEmpty)
    assert(Media.parseY4m(badDim).isEmpty)
    assert(Media.parseY4m(good).exists(_.lumaOffsets.length == 4))
  }

  test("Y4M: mono and 444 colorspaces parse with their plane sizes") {
    val rnd = new scala.util.Random(61)
    def frame = Array.fill(16 * 8)(rnd.nextInt(256).toByte)
    def build(cs: String, chromaPerFrame: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W16 H8 $cs\n".getBytes("US-ASCII"))
      for (_ <- 0 until 3) {
        out.write("FRAME\n".getBytes("US-ASCII"))
        out.write(frame)
        var k = 0
        while (k < chromaPerFrame) { out.write(200); k += 1 }
      }
      out.toByteArray
    }
    assert(Media.parseY4m(build("Cmono", 0)).exists(_.lumaOffsets.length == 3))
    assert(Media.parseY4m(build("C444", 16 * 8 * 2)).exists(_.lumaOffsets.length == 3))
    // wrong chroma size for the declared colorspace → malformed
    assert(Media.parseY4m(build("C444", 10)).isEmpty)
  }

  // ------------------------------------------------------- AVI / MJPEG
  // builders shared with the m06 oracle fixture (single owner — see
  // graft.multimodal.AviFixture)

  import graft.multimodal.AviFixture.{blockJpeg, chunk, le32 => le32b, list => riffList}
  private def avi(frameChunks: Array[Byte]*): Array[Byte] =
    graft.multimodal.AviFixture.avi(frameChunks)
  /** Idealized replay of videoHash60 over F block-pattern frames —
    * the m06 oracle's arithmetic in Scala (255/0 levels; valid because
    * solid DCT-aligned blocks decode without threshold-crossing error).
    */
  private def expectedBlockHash(nF: Int, white: (Int, Int, Int) => Boolean): Long = {
    val votes = new Array[Int](60)
    for (w <- 0 until 8) {
      val fi = (w * nF / 8)
      val px = (0 until 64).map(j => if (white(j / 8, j % 8, fi)) 255 else 0)
      val mean = px.sum / 64
      for (j <- 0 until 60; if px(j) > mean) votes(j) += 1
    }
    (0 until 60).filter(j => votes(j) * 2 > 8).map(1L << _).sum
  }

  test("AVI/MJPEG: real JPEG frames decoded; hash replays the block formula exactly") {
    def white(r: Int, c: Int, fi: Int) = (r + 2 * c + 3 * (fi / 4)) % 5 < 2
    val frames = (0 until 10).map(fi =>
      chunk("00dc", blockJpeg(white(_, _, fi), gray = true)))
    val payload = avi(frames: _*)
    val h = Media.videoHash60(payload)
    assert(h == expectedBlockHash(10, white),
      f"decoded hash $h%x != block-formula replay ${expectedBlockHash(10, white)}%x")
    assert(h != 0L)
    assert(h == Media.videoHash60(payload.clone()), "not deterministic")
    // parse surface: all 10 frame chunks found in order
    assert(Media.parseAviFrames(payload).exists(_.length == 10))
  }

  test("AVI/MJPEG: color frames ride the integer BT.601 path to the same hash") {
    def white(r: Int, c: Int, fi: Int) = (r + 2 * c + fi / 5) % 3 == 0
    val gray = avi((0 until 10).map(fi =>
      chunk("00dc", blockJpeg(white(_, _, fi), gray = true))): _*)
    val color = avi((0 until 10).map(fi =>
      chunk("00dc", blockJpeg(white(_, _, fi), gray = false))): _*)
    // r=g=b color blocks: (299r+587g+114b)/1000 == the gray level, so
    // chroma handling must not move a single threshold vote
    assert(Media.videoHash60(color) == Media.videoHash60(gray),
      "color decode path diverged from grayscale on identical luma")
  }

  test("AVI/MJPEG: rec -nested frames and odd-size padding both walk correctly") {
    def white(r: Int, c: Int, fi: Int) = (r + c + fi) % 4 == 0
    val frames = (0 until 10).map(fi => chunk("00dc", blockJpeg(white(_, _, fi), gray = true)))
    val flat = avi(frames: _*)
    // same frames grouped into interleave-style 'rec ' sub-lists
    val nested = {
      val hdrl = riffList("hdrl", chunk("avih", new Array[Byte](56)))
      val movi = riffList("movi",
        frames.grouped(2).flatMap(g => riffList("rec ", g.flatten.toArray)).toArray)
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32b(body.length) ++ body
    }
    assert(Media.parseAviFrames(nested).exists(_.length == 10))
    assert(Media.videoHash60(nested) == Media.videoHash60(flat),
      "rec -nested frames must hash like the flat layout")
    // JPEG payloads are frequently odd-length → the pad byte after the
    // chunk must be skipped, or every following fourcc misaligns;
    // force oddness with a one-byte junk chunk up front
    val oddFirst = {
      val movi = riffList("movi",
        chunk("00wb", Array[Byte](7)) ++ frames.flatten.toArray)
      val body = "AVI ".getBytes("US-ASCII") ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32b(body.length) ++ body
    }
    assert(Media.parseAviFrames(oddFirst).exists(_.length == 10),
      "odd-size chunk padding broke the walk")
  }

  test("AVI: malformed containers and non-JPEG codecs degrade to the content hash, never throw") {
    def white(r: Int, c: Int, fi: Int) = (r + 2 * c + fi) % 5 < 2
    val good = avi((0 until 6).map(fi =>
      chunk("00dc", blockJpeg(white(_, _, fi), gray = true))): _*)
    // truncation mid-frame: structurally refused, deterministic fallback
    val truncated = good.take(good.length / 2)
    assert(Media.parseAviFrames(truncated).isEmpty)
    assert(Media.videoHash60(truncated) == Media.videoHash60(truncated.clone()))
    // a declared chunk size overrunning the buffer: refused
    val overrun = good.clone()
    // corrupt the movi LIST's first frame-chunk size field to MaxInt
    val moviAt = {
      var i = 12; var found = -1
      while (found < 0 && i < overrun.length - 8) {
        if (new String(overrun, i, 4, "US-ASCII") == "LIST" &&
            new String(overrun, i + 8, 4, "US-ASCII") == "movi") found = i
        i += 1
      }
      found
    }
    assert(moviAt > 0)
    System.arraycopy(le32b(Int.MaxValue), 0, overrun, moviAt + 16, 4)
    assert(Media.parseAviFrames(overrun).isEmpty)
    assert(Media.videoHash60(overrun) >= 0)
    // a structurally-valid AVI whose frames are NOT JPEGs (DivX-style
    // opaque codec data): parses, fails decode, falls back whole —
    // never a half-decoded mix
    val rnd = new scala.util.Random(67)
    val alien = avi((0 until 6).map(_ =>
      chunk("00dc", Array.fill(500)(rnd.nextInt(256).toByte))): _*)
    assert(Media.parseAviFrames(alien).exists(_.length == 6), "structural parse should pass")
    assert(Media.videoHash60(alien) == Media.videoHash60(alien.clone()))
    // WAV is RIFF too — must not be claimed by the AVI parser
    val wav = Media.buildWav(8000, 1, Array.fill(64)(1.toByte))
    assert(Media.parseAviFrames(wav).isEmpty)
  }
}
