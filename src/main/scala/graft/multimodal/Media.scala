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

  private def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  val dhashUdf: UserDefinedFunction = udf((b: Array[Byte]) => if (b == null) None else dhash64(b))
  val ahashUdf: UserDefinedFunction = udf((b: Array[Byte]) => if (b == null) None else ahash64(b))

  /** Perceptual-hash similarity: 1 − dist/64 (media_fingerprinting.py:250-260). */
  def phashSimilarity(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    lit(1.0) - Hashing.hamming(a, b).cast("double") / 64.0

  // ------------------------------------------------------- generic binary

  /** Canonical multimodal schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video|binary
    StructField("mime", StringType, nullable = true),
    StructField("content", BinaryType, nullable = true)))

  /** Feature-extraction output schema (fixed-width float vector). */
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
    */
  private[multimodal] def fakeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
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
    val spark = media.sparkSession
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
