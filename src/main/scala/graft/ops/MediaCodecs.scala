package graft.ops

/** Pure-JVM codecs for uncompressed media containers (VERDICT r4 item
  * #6): binary PPM (P6) images and RIFF/WAVE PCM-16 audio. The sandbox
  * ships no native image/audio libraries, but these formats need none —
  * a header parse plus raw samples — which makes the multimodal decode
  * path REAL end-to-end: payload bytes in a binary column, batched
  * per-partition decode on executors, deterministic features out.
  *
  * Both decoders are strict: malformed input throws with a reason
  * rather than returning garbage (a production pipeline routes those
  * rows to a quarantine sink).
  */
object MediaCodecs {

  // ---- PPM (portable pixmap, binary P6) -------------------------------

  /** decoded P6 image: packed RGB bytes, row-major, 3 bytes/pixel */
  final case class Ppm(width: Int, height: Int, maxval: Int, pixels: Array[Byte])

  /** Serialize a P6 image. `pixels.length` must be `3*w*h`. */
  def encodePpm(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == 3 * width * height,
      s"P6 payload needs ${3 * width * height} bytes, got ${pixels.length}")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Parse a binary PPM: `P6`, then three whitespace-separated decimal
    * fields (width, height, maxval) with `#` comments allowed between
    * tokens per the netpbm spec, then ONE whitespace byte, then
    * `3*w*h` raw RGB bytes (maxval <= 255; 2-byte samples unsupported).
    */
  def decodePpm(bytes: Array[Byte]): Ppm = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 ppm (bad magic)")
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    def skipWsAndComments(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (i < bytes.length && isWs(bytes(i))) { i += 1; moved = true }
        if (i < bytes.length && bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
          moved = true
        }
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
        s"ppm header: expected digit at offset $i")
      var v = 0
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
        require(v <= (1 << 28), "ppm header value out of range")
      }
      v
    }
    val w = readInt(); val h = readInt(); val mv = readInt()
    require(w > 0 && h > 0, s"ppm: bad dimensions ${w}x$h")
    require(mv > 0 && mv <= 255, s"ppm: unsupported maxval $mv")
    require(i < bytes.length && isWs(bytes(i)), "ppm: missing header terminator")
    i += 1 // exactly one whitespace byte before raster data
    // Long math: 3*w*h overflows Int for dimensions the per-value guard
    // still admits — a wrapped size would "decode" garbage instead of
    // throwing (strict-decoder contract)
    val n = 3L * w * h
    require(bytes.length - i >= n,
      s"ppm: raster truncated (${bytes.length - i} of $n bytes)")
    val px = java.util.Arrays.copyOfRange(bytes, i, i + n.toInt)
    Ppm(w, h, mv, px)
  }

  // ---- WAV (RIFF/WAVE, PCM signed 16-bit little-endian) ---------------

  /** decoded PCM audio: interleaved 16-bit samples */
  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Serialize mono/stereo PCM-16 as a canonical RIFF/WAVE file. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      "sample count must divide by channel count")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse RIFF/WAVE by WALKING THE CHUNK LIST (real files carry LIST/
    * fact/cue chunks between fmt and data — a fixed-offset reader would
    * misparse them); accepts PCM-16 only. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 12 && tag4() == "RIFF", "not a RIFF file")
    buf.getInt // riff size (unreliable in the wild; chunk walk below)
    require(tag4() == "WAVE", "not a WAVE file")
    var sampleRate = -1; var channels = -1; var bits = -1; var fmt = -1
    var data: Array[Short] = null
    while (buf.remaining() >= 8) {
      val id = tag4(); val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(), s"chunk '$id' overruns file")
      val next = buf.position() + len + (len & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          fmt = buf.getShort
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort
        case "data" =>
          require(fmt != -1, "data chunk before fmt")
          require(fmt == 1 && bits == 16,
            s"unsupported encoding (fmt=$fmt bits=$bits; PCM-16 only)")
          require(len % 2 == 0, "odd PCM-16 data length")
          data = new Array[Short](len / 2)
          var k = 0
          while (k < data.length) { data(k) = buf.getShort; k += 1 }
        case _ => () // LIST/fact/cue/...: skipped by the chunk walk
      }
      buf.position(math.min(next, buf.limit()))
    }
    require(data != null, "no data chunk")
    require(sampleRate > 0 && channels > 0, "bad fmt chunk")
    Wav(sampleRate, channels, data)
  }
}
