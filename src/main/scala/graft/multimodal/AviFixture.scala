package graft.multimodal

/** Deterministic MJPEG-in-AVI fixture building blocks — the SINGLE
  * owner shared by the m06 oracle query
  * ([[graft.queries.TextQueries]]) and the MultimodalSpec container
  * tests: two independent copies of the RIFF framing or the
  * block-JPEG painter would drift apart on the next container fix,
  * and the oracle only cross-checks one of them.
  *
  * The frames are checkers of SOLID 8×8 blocks aligned to the JPEG
  * DCT grid, so every block encodes as DC-only and decodes to a
  * constant within a few units of its source level (no cross-block
  * ringing: AC coefficients are exactly zero). The videoHash60
  * sampling grid (row (j/8)·64/8, col (j%8)·64/8) lands on block
  * corners, one block per bit, so the BLOCK FORMULA — not the decoded
  * bytes — is the replayable ground truth (see the m06 oracle).
  */
private[graft] object AviFixture {

  def le32(v: Int): Array[Byte] = Array[Byte](
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** RIFF chunk: fourcc + LE size + data + even-size pad byte. */
  def chunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])

  /** RIFF LIST chunk with a 4-char list type. */
  def list(kind: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", kind.getBytes("US-ASCII") ++ body)

  /** Minimal AVI container: `hdrl` (empty avih) + `movi` holding the
    * given frame chunks in order.
    */
  def avi(frameChunks: Seq[Array[Byte]]): Array[Byte] = {
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", frameChunks.flatten.toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** 64×64 JPEG frame of solid 8×8 blocks: block (r,c) is white (255)
    * iff `white(r, c)`, else black (0). `gray = false` paints r=g=b
    * color pixels so the decoder's integer BT.601 path yields the
    * same values as the grayscale band read.
    */
  def blockJpeg(white: (Int, Int) => Boolean, gray: Boolean = true): Array[Byte] = {
    val t = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(64, 64, t)
    for (r <- 0 until 8; c <- 0 until 8) {
      val v = if (white(r, c)) 255 else 0
      for (y <- 0 until 8; x <- 0 until 8)
        if (gray) img.getRaster.setSample(c * 8 + x, r * 8 + y, 0, v)
        else img.setRGB(c * 8 + x, r * 8 + y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
}
