package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs: hand-rolled byte-level parsers for the uncompressed
  * containers — 24-bit BMP (BITMAPINFOHEADER), PCM16 WAV (RIFF), AVI with
  * uncompressed DIB ('00db') video frames (RIFF) — plus COMPRESSED
  * formats with no external library: JPEG, PNG, and GIF (LZW,
  * palette) images through the JDK's own `javax.imageio` (the JDK ships
  * libjpeg/zlib/LZW ports), and
  * G.711 µ-law/A-law companded audio through hand-rolled ITU-T tables.
  *
  * All image decodes converge on one struct ([[Bmp]]: row-major top-down
  * RGB) and all audio decodes on 16-bit linear [[Wav]] samples, so every
  * kernel works identically across formats. PNG round-trips losslessly
  * (exact pixels asserted in spec); JPEG decode is deterministic for a
  * given JRE (asserted); G.711 expansion is table-exact. MP3 and H.264
  * remain out of scope: the JDK carries no decoder for them and the
  * sandbox ships no codec libraries — the container layer, the part a
  * Spark pipeline owns, is fully exercised without them.
  *
  * Everything here is a pure function over byte arrays: it runs inside
  * `mapPartitions` batches on executors, never on the driver.
  */
object MediaCodecs {

  // ImageIO needs no display, but be explicit so executor JVMs without a
  // headless flag never try to touch a windowing toolkit.
  if (System.getProperty("java.awt.headless") == null)
    System.setProperty("java.awt.headless", "true")

  final case class Bmp(width: Int, height: Int, rgb: Array[Byte]) {
    /** Row-major top-down; 3 bytes (R,G,B) per pixel. */
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * width + x) * 3
      ((rgb(o) & 0xff), (rgb(o + 1) & 0xff), (rgb(o + 2) & 0xff))
    }
  }

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode a 24-bit uncompressed BMP (bottom-up rows, 4-byte row padding,
    * BGR byte order — the format's canonical layout).
    */
  def encodeBmp(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val stride = rowStride(width)
    val dataSize = stride * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putShort(0).putShort(0)
    buf.putInt(54) // pixel data offset
    buf.putInt(40) // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height) // positive: bottom-up
    buf.putShort(1) // planes
    buf.putShort(24) // bits per pixel
    buf.putInt(0) // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0)
    var y = height - 1 // bottom row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a 24-bit uncompressed BMP into row-major top-down RGB. Handles
    * both bottom-up (positive height) and top-down (negative height) files,
    * arbitrary pixel-data offsets, and row padding. Malformed payloads
    * raise [[graft.InvalidConfig]]-style IllegalArgumentException with the
    * offending field — the per-row quarantine pattern catches these.
    */
  def decodeBmp(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 54, s"truncated BMP header: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'B' && buf.get(1) == 'M', "missing BM magic")
    val dataOffset = buf.getInt(10)
    val headerSize = buf.getInt(14)
    require(headerSize >= 40, s"unsupported DIB header size $headerSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24, s"unsupported bpp $bpp (only 24-bit supported)")
    require(compression == 0, s"unsupported compression $compression")
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    // Long arithmetic + bounds: a corrupt header with huge dimensions (or
    // a negative data offset) must raise the quarantine-catchable
    // IllegalArgumentException here, not overflow Int past the check and
    // then die on array allocation/indexing inside the executor.
    require(width <= (1 << 20) && height <= (1 << 20) &&
      width.toLong * height * 3 <= Int.MaxValue,
      s"implausible dimensions ${width}x$height")
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"bad pixel-data offset $dataOffset")
    val stride = rowStride(width)
    val need = dataOffset.toLong + stride.toLong * height
    require(bytes.length >= need,
      s"truncated pixel data: need $need, have ${bytes.length}")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      var x = 0
      val base = dataOffset + srcRow * stride
      while (x < width) {
        val src = base + x * 3
        val dst = (y * width + x) * 3
        rgb(dst) = bytes(src + 2) // R (stored as BGR)
        rgb(dst + 1) = bytes(src + 1) // G
        rgb(dst + 2) = bytes(src) // B
        x += 1
      }
      y += 1
    }
    Bmp(width, height, rgb)
  }

  /** Encode via the JDK's ImageIO: `format` is "jpg"/"jpeg" (lossy,
    * deterministic per JRE) or "png" (lossless). Same pixel-function shape
    * as [[encodeBmp]], so the synthesizer treats all image formats alike.
    */
  def encodeImageIO(format: String, width: Int, height: Int,
                    pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out),
      s"no ImageIO writer for format '$format'")
    out.toByteArray
  }

  /** Decode ANY supported image payload into the shared row-major RGB
    * struct: BMP by magic through the hand-rolled parser; JPEG, PNG, and
    * GIF through ImageIO. Malformed payloads raise
    * IllegalArgumentException with the cause — the per-row quarantine
    * pattern catches these uniformly.
    */
  def decodeImage(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 2, s"truncated image payload: ${bytes.length} bytes")
    if (bytes(0) == 'B' && bytes(1) == 'M') return decodeBmp(bytes)
    // Header-FIRST probing (reader API, not ImageIO.read): the plausibility
    // bound on declared dimensions must run BEFORE any raster allocation —
    // a crafted header claiming huge dimensions would otherwise OOM or
    // overflow inside the decode, escaping the quarantine net exactly like
    // the corrupt-BMP case decodeBmp guards against.
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val (w, h, img) =
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext,
          "no ImageIO reader matched the payload (bad magic)")
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val (w0, h0) =
            try (reader.getWidth(0), reader.getHeight(0))
            catch {
              // JDK ImageIO readers throw unwrapped RuntimeExceptions on
              // fuzzed input (AIOOBE/CMMException/...), not just
              // IOException — normalize ALL of them into the
              // quarantine-catchable shape.
              case e: IllegalArgumentException => throw e
              case scala.util.control.NonFatal(e) =>
                throw new IllegalArgumentException(s"image header decode failed: $e")
            }
          // Hard pixel cap, not just raster-byte-fits-Int: compressed
          // formats have no payload-size backstop (a few-KB PNG can
          // declare 400M px and OOM the decode raster), so bound the
          // DECLARED pixel count outright — 64M px ≈ 192 MB RGB, far
          // beyond any training-pipeline thumbnail/feature input.
          require(w0 > 0 && h0 > 0 && w0.toLong * h0 <= (1L << 26),
            s"implausible dimensions ${w0}x$h0")
          val decoded =
            try reader.read(0)
            catch {
              case e: IllegalArgumentException => throw e
              case scala.util.control.NonFatal(e) =>
                throw new IllegalArgumentException(s"image decode failed: $e")
            }
          (w0, h0, decoded)
        } finally reader.dispose()
      } finally iis.close()
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val o = (y * w + x) * 3
        rgb(o) = ((p >> 16) & 0xff).toByte
        rgb(o + 1) = ((p >> 8) & 0xff).toByte
        rgb(o + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Bmp(w, h, rgb)
  }

  /** Nearest-neighbor resample — a REAL pixel kernel (not a metadata fake):
    * deterministic, codec-free, and the resize semantics a training
    * pipeline's thumbnail stage needs.
    */
  def resampleBmp(img: Bmp, newWidth: Int, newHeight: Int): Bmp = {
    require(newWidth > 0 && newHeight > 0)
    val out = new Array[Byte](newWidth * newHeight * 3)
    var y = 0
    while (y < newHeight) {
      val sy = math.min(img.height - 1, y * img.height / newHeight)
      var x = 0
      while (x < newWidth) {
        val sx = math.min(img.width - 1, x * img.width / newWidth)
        val src = (sy * img.width + sx) * 3
        val dst = (y * newWidth + x) * 3
        out(dst) = img.rgb(src); out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Bmp(newWidth, newHeight, out)
  }

  /** Encode mono/stereo PCM16 WAV (RIFF + fmt + data chunks). */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
                     samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0)
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16) // PCM fmt chunk size
    buf.putShort(1) // audio format: PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  // --- G.711 companded audio (µ-law / A-law) -------------------------------
  // COMPRESSED telephony audio decoded with pure 256-entry tables — the
  // ITU-T G.711 log-companding standard (public-domain reference
  // algorithm), hand-rolled like the containers; no codec library.

  private val mulawTable: Array[Short] = Array.tabulate(256) { b =>
    val u = ~b & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0xf
    val x = (((mant << 3) + 0x84) << exp) - 0x84
    (if ((u & 0x80) != 0) -x else x).toShort
  }

  private val alawTable: Array[Short] = Array.tabulate(256) { b =>
    val a = b ^ 0x55
    val mant = (a & 0xf) << 4
    val x = ((a >> 4) & 7) match {
      case 0 => mant + 8
      case 1 => mant + 0x108
      case e => (mant + 0x108) << (e - 1)
    }
    (if ((a & 0x80) != 0) x else -x).toShort // sign bit SET = positive (A-law)
  }

  /** Expand one G.711 codeword to 16-bit linear. */
  def decodeG711(b: Byte, aLaw: Boolean): Short =
    if (aLaw) alawTable(b & 0xff) else mulawTable(b & 0xff)

  /** Nearest-codeword G.711 encoder (synthesizer/tests): by construction
    * the exact inverse of the decode table at representable values.
    * O(1) per sample via a one-time 65536-entry inverse LUT (the naive
    * 256-way scan per sample was ~256× slower through the synthesizer's
    * executor hot path).
    */
  def encodeG711(s: Short, aLaw: Boolean): Byte =
    (if (aLaw) alawInverse else mulawInverse)((s & 0xffff) ^ 0x8000)

  private def inverseLut(t: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](65536)
    var v = -32768
    while (v <= 32767) {
      var best = 0; var bestD = Int.MaxValue; var i = 0
      while (i < 256) {
        val d = math.abs(t(i) - v)
        if (d < bestD) { bestD = d; best = i } // first-min: scan semantics
        i += 1
      }
      out((v & 0xffff) ^ 0x8000) = best.toByte
      v += 1
    }
    out
  }
  private lazy val mulawInverse: Array[Byte] = inverseLut(mulawTable)
  private lazy val alawInverse: Array[Byte] = inverseLut(alawTable)

  /** Encode a G.711 WAV (fmt tag 7 = µ-law, 6 = A-law; 8 bits/sample). */
  def encodeWavG711(sampleRate: Int, channels: Int, samples: Array[Short],
                    aLaw: Boolean): Array[Byte] = {
    require(sampleRate > 0 && channels > 0)
    val dataSize = samples.length
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)
    buf.putShort(if (aLaw) 6 else 7) // WAVE_FORMAT_ALAW / _MULAW
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels) // byte rate (1 byte/sample)
    buf.putShort(channels.toShort) // block align
    buf.putShort(8) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.put(encodeG711(samples(i), aLaw)); i += 1 }
    buf.array()
  }

  final case class Avi(width: Int, height: Int, fps: Int,
                       frames: Vector[Bmp])

  /** Encode an AVI (RIFF) file with an uncompressed 24-bit DIB video
    * stream: `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    * LIST('movi' 00db…) idx1)` — the canonical layout of an
    * uncompressed-video AVI. Frames are bottom-up BGR rows with 4-byte
    * padding (the DIB wire format, same as BMP pixel data).
    */
  def encodeAvi(width: Int, height: Int, fps: Int,
                frames: Seq[(Int, Int) => (Int, Int, Int)]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty,
      s"bad AVI params ${width}x$height@$fps×${frames.size}")
    val stride = rowStride(width)
    val frameSize = stride * height
    // sizes: hdrl list = 4(type) + (8+56)avih + 8+4+(8+56)strh+(8+40)strf
    val strlSize = 4 + 64 + 48
    val hdrlSize = 4 + 64 + 8 + strlSize
    val moviSize = 4 + frames.size * (8 + frameSize)
    val idx1Size = frames.size * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps) // dwMicroSecPerFrame
    buf.putInt(frameSize * fps) // dwMaxBytesPerSec
    buf.putInt(0) // padding granularity
    buf.putInt(0x10) // AVIF_HASINDEX
    buf.putInt(frames.size) // dwTotalFrames
    buf.putInt(0) // initial frames
    buf.putInt(1) // streams
    buf.putInt(frameSize) // suggested buffer size
    buf.putInt(width); buf.putInt(height)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0) // reserved
    fourcc("LIST"); buf.putInt(strlSize); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0); buf.putInt(0); buf.putInt(0) // flags, prio+lang, initial
    buf.putInt(1); buf.putInt(fps) // dwScale=1, dwRate=fps
    buf.putInt(0); buf.putInt(frames.size) // start, length (frames)
    buf.putInt(frameSize); buf.putInt(-1); buf.putInt(0) // bufsize, quality, samplesize
    buf.putShort(0); buf.putShort(0) // rcFrame left, top
    buf.putShort(width.toShort); buf.putShort(height.toShort)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40); buf.putInt(width); buf.putInt(height)
    buf.putShort(1); buf.putShort(24)
    buf.putInt(0) // BI_RGB
    buf.putInt(frameSize)
    buf.putInt(2835); buf.putInt(2835); buf.putInt(0); buf.putInt(0)
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    val offsets = frames.map { pixel =>
      // idx1 offsets are movi-relative: distance from the 'movi' fourcc to
      // this chunk's header (first chunk = 4, the standard convention).
      val off = buf.position() - (8 + 8 + hdrlSize + 8 + 4)
      fourcc("00db"); buf.putInt(frameSize)
      var y = height - 1
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val (r, g, b) = pixel(x, y)
          buf.put(b.toByte).put(g.toByte).put(r.toByte)
          x += 1
        }
        var pad = stride - width * 3
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        y -= 1
      }
      off
    }
    fourcc("idx1"); buf.putInt(idx1Size)
    offsets.foreach { off =>
      fourcc("00db"); buf.putInt(0x10) // AVIIF_KEYFRAME
      buf.putInt(off); buf.putInt(frameSize)
    }
    buf.array()
  }

  /** Decode an uncompressed-DIB AVI: full RIFF walk (hdrl → avih + the
    * VIDEO stream's strh/strf for geometry/bpp, movi list for that
    * stream's '##db'/'##dc' frame chunks — nested 'rec ' lists included,
    * as interleaved writers emit them). Stream-aware: strl blocks are
    * numbered in hdrl order, frame chunks carry their stream number as a
    * 2-digit prefix, and only the FIRST 'vids' stream's chunks are decoded
    * — an AVI whose audio stream is listed first (common in the wild)
    * decodes correctly instead of parsing WAVEFORMATEX bytes as geometry.
    * Returns top-down RGB frames. Compressed video (biCompression != 0)
    * fails loudly.
    */
  def decodeAvi(bytes: Array[Byte]): Avi = {
    require(bytes.length >= 12, s"truncated AVI: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
      s"missing RIFF/AVI magic: ${fourcc(0)}/${fourcc(8)}")
    var width = -1; var height = -1; var fps = 30
    var bpp = -1; var compression = -1
    var streamIdx = -1 // strl blocks seen so far - 1
    var videoStream = -1 // index of the first 'vids' stream
    var lastStreamIsVideo = false
    val frames = Vector.newBuilder[Bmp]
    def decodeFrame(off: Int, size: Int): Bmp = {
      val stride = rowStride(width)
      require(size.toLong >= stride.toLong * height,
        s"frame chunk too small: $size < ${stride.toLong * height}")
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val base = off + (height - 1 - y) * stride // bottom-up
        var x = 0
        while (x < width) {
          val dst = (y * width + x) * 3
          rgb(dst) = bytes(base + x * 3 + 2)
          rgb(dst + 1) = bytes(base + x * 3 + 1)
          rgb(dst + 2) = bytes(base + x * 3)
          x += 1
        }
        y += 1
      }
      Bmp(width, height, rgb)
    }
    // Recursive chunk walk: LIST chunks nest, everything else is flat.
    def walk(off: Int, end: Int): Unit = {
      var o = off
      while (o + 8 <= end) {
        val id = fourcc(o)
        val size = buf.getInt(o + 4)
        require(size >= 0 && o + 8 + size <= end,
          s"chunk $id overruns container (size=$size at off=$o)")
        id match {
          case "LIST" => walk(o + 12, o + 8 + size) // skip list-type fourcc
          case "avih" =>
            require(size >= 40, s"avih too small: $size")
            val usPerFrame = buf.getInt(o + 8)
            if (usPerFrame > 0) fps = math.max(1, 1000000 / usPerFrame)
          case "strh" =>
            streamIdx += 1
            lastStreamIsVideo = size >= 4 && fourcc(o + 8) == "vids"
            if (lastStreamIsVideo && videoStream < 0) videoStream = streamIdx
          case "strf" if lastStreamIsVideo && width < 0 =>
            require(size >= 40, s"video strf too small: $size")
            width = buf.getInt(o + 12)
            height = math.abs(buf.getInt(o + 16))
            bpp = buf.getShort(o + 22)
            compression = buf.getInt(o + 24)
            require(bpp == 24, s"unsupported bpp $bpp (only 24-bit DIB)")
            require(compression == 0,
              s"unsupported compression $compression (only BI_RGB)")
            require(width > 0 && height > 0 &&
              width <= (1 << 20) && height <= (1 << 20) &&
              width.toLong * height * 3 <= Int.MaxValue,
              s"implausible video dimensions ${width}x$height")
          case c if c.length == 4 && (c.endsWith("db") || c.endsWith("dc")) &&
              c.take(2).forall(_.isDigit) &&
              c.take(2).toInt == videoStream =>
            require(width > 0, s"frame chunk $c before the video strf header")
            frames += decodeFrame(o + 8, size)
          case _ => // skip (audio strf/chunks, other streams, idx1, JUNK, …)
        }
        o += 8 + size + (size & 1) // word alignment
      }
    }
    walk(12, bytes.length)
    val fs = frames.result()
    require(fs.nonEmpty, "no video frame chunks found")
    Avi(width, height, fps, fs)
  }

  /** Decode WAV: chunk walk (fmt may be followed by LIST/fact etc. before
    * data — real-world files do this), strict on format fields. Accepts
    * PCM16 (fmt 1) plus COMPRESSED G.711 A-law/µ-law (fmt 6/7, 8-bit
    * codewords expanded to 16-bit linear via the ITU-T tables) — every
    * downstream audio kernel sees uniform 16-bit samples.
    */
  def decodeWavPcm16(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 44, s"truncated WAV header: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE",
      s"missing RIFF/WAVE magic: ${fourcc(0)}/${fourcc(8)}")
    var off = 12
    var sampleRate = -1
    var channels = -1
    var fmtTag = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = fourcc(off)
      val size = buf.getInt(off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk $id overruns payload (size=$size at off=$off)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          fmtTag = buf.getShort(off + 8)
          require(fmtTag == 1 || fmtTag == 6 || fmtTag == 7,
            s"unsupported audio format $fmtTag (PCM16, A-law, µ-law)")
          channels = buf.getShort(off + 10)
          sampleRate = buf.getInt(off + 12)
          val bits = buf.getShort(off + 22)
          require(bits == (if (fmtTag == 1) 16 else 8),
            s"unsupported bits/sample $bits for format $fmtTag")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          if (fmtTag == 1) {
            samples = new Array[Short](size / 2)
            var i = 0
            while (i < samples.length) {
              samples(i) = buf.getShort(off + 8 + i * 2); i += 1
            }
          } else {
            // G.711: expand each companded byte to 16-bit linear.
            val aLaw = fmtTag == 6
            samples = new Array[Short](size)
            var i = 0
            while (i < samples.length) {
              samples(i) = decodeG711(bytes(off + 8 + i), aLaw); i += 1
            }
          }
        case _ => // skip unknown chunk (LIST, fact, ...)
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null, "no data chunk found")
    Wav(sampleRate, channels, samples)
  }
}
