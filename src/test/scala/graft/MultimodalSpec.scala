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
}
