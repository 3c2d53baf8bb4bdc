package graft.sources

/** Baseline JFIF (JPEG) leg of the multimodal seam — the format web
  * crawls actually ship, next to the dependency-free BMP/PNG/WAV codecs
  * in [[MediaCodec]]/[[WavCodec]].
  *
  * Reference context: Codeunit 60000 - Config. XML Exchange.al:1144
  * `ExportMediaSet` / :1171 `ExportMedia` move media blobs opaquely;
  * this leg adds the decode verb a training-data ingest needs on crawl
  * imagery.
  *
  * Two independent layers, deliberately separated:
  *  - [[encodeJpeg]]/[[decodeJpeg]] drive the JDK's own baseline JFIF
  *    codec (`javax.imageio`, headless-safe, zero added dependencies) —
  *    REAL lossy DCT compression, so pixel output is codec-pinned by
  *    spec, never by the cross-engine oracle.
  *  - [[parseSof]] walks the JPEG marker segments BY HAND (SOI → SOFn)
  *    and recovers frame geometry from the container bytes alone — the
  *    header-arithmetic layer the DuckDB oracle replays, exactly like
  *    the BMP/PNG header parses (#10/#153/#159).
  */
object JpegCodec {

  // javax.imageio defaults to FILE-backed stream caches: every encode
  // and every decode would create (and delete) a temp file on executor
  // disk — per-ROW I/O that dominates this kernel's wall time and
  // tracks box/disk state (the r13/r17 first-run spike signature). Our
  // payloads are KB-sized and already in memory, so memory caching is
  // strictly better; set once at class init, JVM-wide.
  javax.imageio.ImageIO.setUseCache(false)

  /** Encode an 8-bit RGB raster (row-major, 3 bytes/px) as a baseline
    * JPEG via the JDK encoder. Deterministic within a JVM: fixed
    * quality, no metadata thumbnails, pure function of (w, h, rgb). */
  def encodeJpeg(w: Int, h: Int, rgb: Array[Byte],
                 quality: Float = 0.9f): Array[Byte] = {
    require(rgb.length == 3 * w * h,
      s"rgb must be 3*$w*$h=${3 * w * h} bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = 3 * (w * y + x)
        img.setRGB(x, y, ((rgb(i) & 0xff) << 16) |
          ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { out.close(); writer.dispose() }
    bos.toByteArray
  }

  /** REAL JFIF decode via the JDK decoder → 8-bit RGB raster. Fails
    * loudly on bytes the decoder rejects — a malformed cell must never
    * silently yield an empty raster. */
  def decodeJpeg(bytes: Array[Byte]): MediaCodec.Pixels = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, "javax.imageio could not decode payload as JPEG")
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y); val i = 3 * (w * y + x)
        rgb(i) = ((p >> 16) & 0xff).toByte
        rgb(i + 1) = ((p >> 8) & 0xff).toByte
        rgb(i + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    MediaCodec.Pixels(w, h, rgb)
  }

  /** Frame geometry from a start-of-frame marker segment. */
  case class SofInfo(width: Int, height: Int, components: Int,
                     progressive: Boolean)

  /** Hand-rolled marker walk (ITU T.81 §B): SOI, then length-prefixed
    * segments until a SOFn marker; the frame header carries precision,
    * height, width, component count. Standalone markers (RSTn/TEM) have
    * no length word and are skipped as such. Loud failure on anything
    * that is not a well-formed JPEG — offsets mean nothing once the
    * walk desyncs, the same doctrine as the fixed-width reader. */
  def parseSof(bytes: Array[Byte]): SofInfo = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI marker")
    var i = 2
    while (i + 3 < bytes.length) {
      require((bytes(i) & 0xff) == 0xff,
        f"marker desync at offset $i: 0x${bytes(i) & 0xff}%02x")
      var mk = bytes(i + 1) & 0xff
      // fill bytes: consecutive 0xFF before a marker are legal padding
      while (mk == 0xff && i + 2 < bytes.length) {
        i += 1; mk = bytes(i + 1) & 0xff
      }
      if (mk >= 0xd0 && mk <= 0xd7 || mk == 0x01) {
        i += 2 // RSTn/TEM: standalone, no length word
      } else {
        require(i + 3 < bytes.length,
          s"truncated at segment length word, offset $i")
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        require(len >= 2, s"bad segment length $len at offset $i")
        val isSof = mk >= 0xc0 && mk <= 0xcf &&
          mk != 0xc4 && mk != 0xc8 && mk != 0xcc
        if (isSof) {
          require(len >= 8, s"SOF segment too short: $len")
          require(i + 9 < bytes.length,
            s"truncated inside SOF header at offset $i")
          val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
          val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
          return SofInfo(w, h, bytes(i + 9) & 0xff, progressive = mk == 0xc2)
        }
        require(mk != 0xda, "reached SOS without a SOF marker")
        i += 2 + len
      }
    }
    throw new IllegalArgumentException("no SOF marker found")
  }
}
