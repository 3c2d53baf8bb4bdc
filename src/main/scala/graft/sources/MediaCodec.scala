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
