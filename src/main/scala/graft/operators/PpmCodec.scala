package graft.operators

/** Pure-JVM codec for binary PPM (netpbm P6) images — a REAL decoder
  * for the multimodal tier, built from the public netpbm format spec:
  * ASCII header `P6 <width> <height> <maxval>` (tokens separated by
  * whitespace, `#` comments legal between tokens) followed by ONE
  * whitespace byte and `width·height·3` raw RGB bytes.
  *
  * This exists so the batched media plumbing ([[Multimodal]]) has at
  * least one format where decode, resample, and re-encode are real
  * byte-level work rather than the documented stub: the container has
  * no image libraries, but P6 needs none. Decode is total — malformed
  * or non-PPM bytes return None instead of throwing, because a decode
  * stage that dies on one corrupt payload out of billions is unusable
  * at scale.
  */
object PpmCodec {

  /** A decoded P6 image: packed RGB, row-major, 3 bytes per pixel. */
  final case class Ppm(width: Int, height: Int, rgb: Array[Byte])

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

  /** Reads the next header token starting at `pos`, skipping
    * whitespace and `#`-to-end-of-line comments. Returns (token,
    * position after token) or None on truncation.
    */
  private def token(bytes: Array[Byte], pos0: Int): Option[(String, Int)] = {
    var pos = pos0
    var skipping = true
    while (skipping) {
      while (pos < bytes.length && isWs(bytes(pos))) pos += 1
      if (pos < bytes.length && bytes(pos) == '#') {
        while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      } else skipping = false
    }
    if (pos >= bytes.length) return None
    val start = pos
    while (pos < bytes.length && !isWs(bytes(pos)) && bytes(pos) != '#') pos += 1
    Some((new String(bytes, start, pos - start, "US-ASCII"), pos))
  }

  /** Total decode: None for anything that is not a well-formed
    * 8-bit-per-channel P6 with a complete pixel payload.
    */
  def decode(bytes: Array[Byte]): Option[Ppm] = {
    if (bytes == null || bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    for {
      (w, p1) <- token(bytes, 2)
      (h, p2) <- token(bytes, p1)
      (mx, p3) <- token(bytes, p2)
      width <- w.toIntOption
      height <- h.toIntOption
      maxval <- mx.toIntOption
      if width > 0 && height > 0 && maxval == 255
      // exactly ONE whitespace byte separates the header from the raster
      if p3 < bytes.length && isWs(bytes(p3))
      start = p3 + 1
      need = width.toLong * height * 3
      if start + need <= bytes.length
    } yield Ppm(width, height,
      java.util.Arrays.copyOfRange(bytes, start, start + need.toInt))
  }

  /** Minimal canonical encode: `P6\n<w> <h>\n255\n` + raster. */
  def encode(img: Ppm): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Nearest-neighbor resample — the standard index mapping
    * `src = ⌊dst · srcDim / dstDim⌋` per axis, channels copied
    * together. Exact, allocation-bounded, and cheap enough to run
    * per-row in a decode batch.
    */
  def resizeNearest(img: Ppm, outW: Int, outH: Int): Ppm = {
    require(outW > 0 && outH > 0, "target dims must be positive")
    require(outW.toLong * outH * 3 <= PngCodec.MaxPixelBytes,
      s"target exceeds the ${PngCodec.MaxPixelBytes >> 20} MiB pixel-buffer gate")
    val dst = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * img.height / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * img.width / outW).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * outW + x) * 3
        dst(d) = img.rgb(s); dst(d + 1) = img.rgb(s + 1); dst(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Ppm(outW, outH, dst)
  }

  /** Per-channel means — the cheap global feature a curation pipeline
    * filters on (all-black/all-white detection, channel imbalance).
    */
  def channelMeans(img: Ppm): (Double, Double, Double) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < img.rgb.length) {
      r += img.rgb(i) & 0xff; g += img.rgb(i + 1) & 0xff; b += img.rgb(i + 2) & 0xff
      i += 3
    }
    val n = (img.rgb.length / 3).toDouble
    (r / n, g / n, b / n)
  }
}
