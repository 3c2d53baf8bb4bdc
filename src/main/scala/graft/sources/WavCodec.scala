package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/WAVE codec — PCM s16le mono, hand-rolled like the BMP
  * and PNG writers (JDK-only, real byte-level container work): a
  * 44-byte canonical header (RIFF size, fmt chunk with rate/channels/
  * bits, data chunk) followed by little-endian samples. decode parses
  * and VERIFIES the header (magics, PCM format, 16-bit) and fails
  * loudly on anything else — the audio leg of the multimodal seam.
  */
object WavCodec {

  /** Encode mono 16-bit PCM samples at `sampleRate` as a WAV file. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                       // fmt chunk size
    buf.putShort(1)                      // PCM
    buf.putShort(1)                      // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)           // byte rate
    buf.putShort(2)                      // block align
    buf.putShort(16)                     // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a WAV produced by [[encodeWav]] (or any canonical
    * PCM-s16le-mono file with the 44-byte layout): returns
    * (sampleRate, samples). Loud failure on bad magic/format. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44, s"WAV too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def magic(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII")
    }
    require(magic(4) == "RIFF", "not a RIFF file")
    val riffLen = buf.getInt()
    require(riffLen == bytes.length - 8,
      s"RIFF length $riffLen != ${bytes.length - 8}")
    require(magic(4) == "WAVE", "not a WAVE file")
    require(magic(4) == "fmt ", "fmt chunk missing")
    require(buf.getInt() == 16, "non-canonical fmt chunk")
    require(buf.getShort() == 1, "not PCM")
    require(buf.getShort() == 1, "not mono")
    val sampleRate = buf.getInt()
    buf.getInt()                         // byte rate
    buf.getShort()                       // block align
    require(buf.getShort() == 16, "not 16-bit")
    require(magic(4) == "data", "data chunk missing")
    val dataLen = buf.getInt()
    require(dataLen == bytes.length - 44,
      s"data length $dataLen != ${bytes.length - 44}")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) { samples(i) = buf.getShort(); i += 1 }
    (sampleRate, samples)
  }

  /** Deterministic code-point → sample mapping shared with the SQL
    * oracle: s = (cp mod 256 − 128) · 256 (center byte range, scale to
    * 16-bit). Code points, not bytes, because `unicode(text[i])` is
    * the established cross-engine character contract. */
  def samplesOf(text: String): Array[Short] =
    text.codePoints().toArray.map(cp => (((cp % 256) - 128) * 256).toShort)

  /** 56-bit audio fingerprint over DECODED samples: the |s| energy
    * envelope resampled to 57 contiguous frames (frame k sums
    * positions [k·n/57, (k+1)·n/57) — exact integers, ≤ n·2¹⁵ so far
    * under 2⁶³), then the 1-D difference hash (bit k = E(k+1) > E(k))
    * — the audio analog of [[MediaCodec.dhash56]]: invariant to
    * uniform gain, sensitive to envelope shape. 56 bits stays clear of
    * the BIGINT sign bit in both engines. */
  def energyFp56(samples: Array[Short]): Long = {
    val n = samples.length
    val env = new Array[Long](57)
    var k = 0
    while (k < 57) {
      var i = k * n / 57
      val hi = (k + 1) * n / 57
      var e = 0L
      while (i < hi) { e += math.abs(samples(i).toLong); i += 1 }
      env(k) = e
      k += 1
    }
    var fp = 0L
    k = 0
    while (k < 56) {
      if (env(k + 1) > env(k)) fp |= 1L << k
      k += 1
    }
    fp
  }
}
