package graft

import graft.ops.{MediaCodecs, Multimodal}

/** Byte-level correctness of the pure-JVM media codecs (24-bit BMP, PCM16
  * WAV, uncompressed-DIB AVI) and the real decode-based feature/resize/
  * frame-sample kernels built on them.
  */
class MediaCodecsSpec extends SparkSpec {

  test("BMP encode/decode round-trip recovers exact pixels (incl. padded rows)") {
    // width 3 → row stride 12 with 3 pad bytes: exercises padding.
    val px = Array(
      (255, 0, 0), (0, 255, 0), (0, 0, 255),
      (10, 20, 30), (40, 50, 60), (70, 80, 90))
    val bytes = MediaCodecs.encodeBmp(3, 2, (x, y) => px(y * 3 + x))
    // Header facts, hand-checked: BM magic, 54-byte offset, 24 bpp,
    // bottom-up height, file size 54 + 2*12.
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    assert(bytes.length == 54 + 2 * 12)
    val img = MediaCodecs.decodeBmp(bytes)
    assert(img.width == 3 && img.height == 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(img.pixel(x, y) == px(y * 3 + x), s"pixel ($x,$y)")
    // Bottom-up storage: the FIRST stored row is the LAST logical row, in
    // BGR order — pixel (0,1)=(10,20,30) must sit at data offset 54 as B,G,R.
    assert((bytes(54) & 0xff, bytes(55) & 0xff, bytes(56) & 0xff) == ((30, 20, 10)))
  }

  test("BMP decoder handles top-down files and rejects malformed payloads") {
    val up = MediaCodecs.encodeBmp(2, 2, (x, y) => (x * 100, y * 100, 7))
    // Flip the height sign → top-down: rows are then stored first-to-last,
    // so reinterpreting the same bytes must flip the image vertically.
    val down = up.clone()
    val buf = java.nio.ByteBuffer.wrap(down).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -2)
    val a = MediaCodecs.decodeBmp(up)
    val b = MediaCodecs.decodeBmp(down)
    for (x <- 0 until 2; y <- 0 until 2)
      assert(b.pixel(x, y) == a.pixel(x, 1 - y), s"($x,$y)")

    intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(Array[Byte](1, 2, 3))
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(up.take(58)) // truncated pixel data
    }
    val badMagic = up.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException] { MediaCodecs.decodeBmp(badMagic) }
  }

  test("nearest-neighbor resample: exact expected pixels for 4x4 -> 2x2") {
    // 4x4 image of distinct values; 2x2 nearest-neighbor picks pixels at
    // source coords (0,0),(2,0),(0,2),(2,2).
    val img = MediaCodecs.decodeBmp(
      MediaCodecs.encodeBmp(4, 4, (x, y) => (y * 4 + x, 0, 0)))
    val small = MediaCodecs.resampleBmp(img, 2, 2)
    assert(small.pixel(0, 0)._1 == 0)
    assert(small.pixel(1, 0)._1 == 2)
    assert(small.pixel(0, 1)._1 == 8)
    assert(small.pixel(1, 1)._1 == 10)
  }

  test("WAV encode/decode round-trip; chunk walk skips foreign chunks") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 42)
    val bytes = MediaCodecs.encodeWavPcm16(16000, 1, samples)
    assert(bytes.length == 44 + samples.length * 2)
    val wav = MediaCodecs.decodeWavPcm16(bytes)
    assert(wav.sampleRate == 16000 && wav.channels == 1)
    assert(wav.samples.sameElements(samples))

    // Splice a LIST chunk between fmt and data — decoder must skip it.
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = bytes.take(36) ++ listChunk ++ bytes.drop(36)
    val buf2 = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf2.putInt(4, spliced.length - 8) // fix RIFF size
    val wav2 = MediaCodecs.decodeWavPcm16(spliced)
    assert(wav2.samples.sameElements(samples) && wav2.sampleRate == 16000)

    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWavPcm16("RIFFxxxxNOPE".getBytes("US-ASCII") ++ new Array[Byte](40))
    }
  }

  test("image features come from real decoded pixels (exact statistics)") {
    // Solid red 8x8: meanR = 1, meanG = meanB = 0, luma = 76/255, histogram
    // mass all in the bin of luma 76 (bin 76*12/256 = 3, at offset 4+3).
    val red = MediaCodecs.encodeBmp(8, 8, (_, _) => (255, 0, 0))
    val f = Multimodal.imageFeatures(red, 16)
    assert(f(0) == 1.0f && f(1) == 0.0f && f(2) == 0.0f)
    assert(math.abs(f(3) - 76 / 255.0f) < 1e-6)
    assert(f(4 + 3) == 1.0f && f.slice(4, 16).sum == 1.0f)
  }

  test("audio features come from real decoded samples (exact RMS/ZCR)") {
    // Alternating full-scale square wave: RMS ≈ 1, ZCR = (n-1)/n, mean ≈ 0.
    val n = 256
    val sq = Array.tabulate(n)(i => if (i % 2 == 0) 32767 else -32767).map(_.toShort)
    val f = Multimodal.audioFeatures(MediaCodecs.encodeWavPcm16(8000, 1, sq), 16)
    assert(math.abs(f(0) - 32767f / 32768f) < 1e-4, s"rms ${f(0)}")
    assert(f(1) == (n - 1).toFloat / n, s"zcr ${f(1)}")
    assert(math.abs(f(2)) < 1e-6, s"mean ${f(2)}")
    assert(f(3) == 32767f / 32768f, s"peak ${f(3)}")
  }

  test("AVI encode/decode round-trip recovers exact frames (RIFF walk, idx1 skipped)") {
    // 3 frames of 3x2 (padded rows), distinct per-frame pixels.
    def px(f: Int)(x: Int, y: Int): (Int, Int, Int) = (f * 50 + y * 3 + x, f, 255 - f)
    val bytes = MediaCodecs.encodeAvi(3, 2, 25, (0 until 3).map(f => px(f) _))
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") == "AVI ")
    val avi = MediaCodecs.decodeAvi(bytes)
    assert(avi.width == 3 && avi.height == 2 && avi.fps == 25)
    assert(avi.frames.size == 3)
    for (f <- 0 until 3; y <- 0 until 2; x <- 0 until 3)
      assert(avi.frames(f).pixel(x, y) == px(f)(x, y), s"frame $f ($x,$y)")

    intercept[IllegalArgumentException] {
      MediaCodecs.decodeAvi("RIFFxxxxWAVE".getBytes("US-ASCII") ++ new Array[Byte](40))
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeAvi(bytes.take(60)) // truncated mid-header
    }
    // Compressed stream must fail loudly, not silently garbage-decode:
    val compressed = bytes.clone()
    val cb = java.nio.ByteBuffer.wrap(compressed).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // strf biCompression sits 24 bytes into the strf payload; find 'strf'.
    val strfOff = (0 until compressed.length - 4)
      .find(i => new String(compressed, i, 4, "US-ASCII") == "strf").get
    cb.putInt(strfOff + 8 + 16, 1) // BI_RLE8
    intercept[IllegalArgumentException] { MediaCodecs.decodeAvi(compressed) }
  }

  test("AVI idx1 index uses standard movi-relative offsets (first chunk = 4)") {
    val bytes = MediaCodecs.encodeAvi(3, 2, 25,
      Seq.fill(3)((_: Int, _: Int) => (1, 2, 3)))
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val idxPos = (0 until bytes.length - 4)
      .find(i => new String(bytes, i, 4, "US-ASCII") == "idx1").get
    val frameSize = 12 * 2 // rowStride(3)=12, height 2
    for (f <- 0 until 3) {
      val entry = idxPos + 8 + 16 * f
      assert(new String(bytes, entry, 4, "US-ASCII") == "00db")
      val off = buf.getInt(entry + 8)
      assert(off == 4 + f * (8 + frameSize),
        s"idx1 entry $f offset $off (expected ${4 + f * (8 + frameSize)})")
    }
  }

  test("AVI decoder is stream-aware: audio-listed-first files decode the video stream") {
    import java.nio.{ByteBuffer, ByteOrder}
    val base = MediaCodecs.encodeAvi(3, 2, 25,
      Seq.fill(2)((_: Int, _: Int) => (1, 2, 3)))
    def find(b: Array[Byte], s: String, from: Int = 0): Int =
      (from until b.length - 4)
        .find(i => new String(b, i, 4, "US-ASCII") == s).get
    // Audio strl block (LIST(strl, strh(auds), strf(WAVEFORMATEX))) spliced
    // BEFORE the video strl — the layout real muxers commonly emit.
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def wi(v: Int): Unit = out.write(
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    w("strl")
    w("strh"); wi(56); w("auds"); out.write(new Array[Byte](52))
    w("strf"); wi(16)
    // wFormatTag=1, channels=1, rate=8000, byteRate=16000, align=2, bits=16
    out.write(ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16).array())
    val strlBytes = out.toByteArray
    val audioStrl = "LIST".getBytes("US-ASCII") ++
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(strlBytes.length).array() ++ strlBytes

    val videoStrlPos = find(base, "strl") - 8 // its LIST header
    var spliced = base.take(videoStrlPos) ++ audioStrl ++ base.drop(videoStrlPos)
    // Audio chunk '00wb' at the head of movi (audio is now stream 0).
    val moviPos = find(spliced, "movi")
    val audioChunk = "00wb".getBytes("US-ASCII") ++
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(4).array() ++
      new Array[Byte](4)
    spliced = spliced.take(moviPos + 4) ++ audioChunk ++ spliced.drop(moviPos + 4)
    // Video is stream 1 now: rename its frame chunks 00db → 01db (solid
    // (1,2,3) pixels cannot contain the ASCII pattern).
    for (i <- 0 until spliced.length - 4)
      if (new String(spliced, i, 4, "US-ASCII") == "00db") spliced(i + 1) = '1'
    // Patch sizes: RIFF total, hdrl LIST, movi LIST.
    val bb = ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + audioStrl.length + audioChunk.length)
    bb.putInt(16, bb.getInt(16) + audioStrl.length)
    val moviPos2 = find(spliced, "movi")
    bb.putInt(moviPos2 - 4, bb.getInt(moviPos2 - 4) + audioChunk.length)

    val avi = MediaCodecs.decodeAvi(spliced)
    assert(avi.width == 3 && avi.height == 2 && avi.frames.size == 2,
      s"${avi.width}x${avi.height}×${avi.frames.size}")
    for (f <- 0 until 2; y <- 0 until 2; x <- 0 until 3)
      assert(avi.frames(f).pixel(x, y) == ((1, 2, 3)))
  }

  test("video features come from real decoded frames (exact motion energy)") {
    // Frame 0 solid black, frame 1 solid white, frame 2 black again:
    // mean luma = 1/3 of white's, motion energy = |Δluma| = 1.0 across both
    // transitions.
    val colors = Vector((0, 0, 0), (255, 255, 255), (0, 0, 0))
    val bytes = MediaCodecs.encodeAvi(4, 4, 10,
      colors.map(c => (_: Int, _: Int) => c))
    val f = Multimodal.videoFeatures(bytes, 16)
    assert(math.abs(f(3) - 1.0f / 3) < 1e-6, s"mean luma ${f(3)}")
    assert(math.abs(f(4) - 1.0f) < 1e-6, s"motion ${f(4)}")
    // Static video has zero motion energy:
    val static = MediaCodecs.encodeAvi(4, 4, 10,
      Vector.fill(3)((_: Int, _: Int) => (100, 100, 100)))
    assert(Multimodal.videoFeatures(static, 16)(4) == 0.0f)
  }

  test("sampleFrames yields real decodable frames matching the source video") {
    import spark.implicits._
    val media = Multimodal.synthesize(spark, 4242L, 60L)
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    val byId = media.filter(_.kind == "video").collect()
      .map(r => r.media_id -> r).toMap
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      val src = MediaCodecs.decodeAvi(byId(id).payload)
      fs.foreach { fr =>
        // frame_idx-th sampled frame == source frame at idx*stride, exactly.
        val decoded = MediaCodecs.decodeBmp(fr.frame_bytes)
        val expected = src.frames(fr.frame_idx * 2)
        assert(decoded.rgb.sameElements(expected.rgb),
          s"media $id frame ${fr.frame_idx}")
      }
      assert(fs.length == (src.frames.size + 1) / 2)
    }
  }

  test("synthesized payloads are valid containers; e2e decode through the Spark path") {
    val media = Multimodal.synthesize(spark, 4242L, 120L).collect()
    media.filter(_.kind == "image").foreach { r =>
      val img = MediaCodecs.decodeBmp(r.payload)
      assert(img.width == r.width && img.height == r.height)
    }
    media.filter(_.kind == "audio").foreach { r =>
      assert(MediaCodecs.decodeWavPcm16(r.payload).sampleRate == r.sample_rate)
    }
    media.filter(_.kind == "video").foreach { r =>
      val avi = MediaCodecs.decodeAvi(r.payload)
      assert(avi.width == r.width && avi.height == r.height)
      assert(avi.frames.size == r.n_frames)
    }
    // Distributed feature extraction decodes every image/audio payload for
    // real — any malformed container would throw in the executor.
    val feats = Multimodal.extractFeatures(
      Multimodal.synthesize(spark, 4242L, 120L)).collect()
    assert(feats.length == 120)
    val imgFeat = feats.filter(_.kind == "image")
    assert(imgFeat.nonEmpty && imgFeat.forall(f => f.feature(3) > 0.0f))
    // Real resize keeps payloads decodable at the new size.
    val resized = Multimodal.resize(
      Multimodal.synthesize(spark, 4242L, 120L), 8).collect()
    resized.filter(_.kind == "image").foreach { r =>
      assert(math.max(r.width, r.height) <= 8)
      val img = MediaCodecs.decodeBmp(r.payload)
      assert(img.width == r.width && img.height == r.height)
    }
    // Video resize transcodes for real: result is a valid AVI at the new
    // geometry with the frame count preserved.
    resized.filter(_.kind == "video").foreach { r =>
      assert(math.max(r.width, r.height) <= 8)
      val avi = MediaCodecs.decodeAvi(r.payload)
      assert(avi.width == r.width && avi.height == r.height)
      assert(avi.frames.size == r.n_frames)
    }
  }

  test("PNG encode/decode round-trip is LOSSLESS (exact pixels via JDK ImageIO)") {
    val px = Array(
      (255, 0, 0), (0, 255, 0), (0, 0, 255),
      (10, 20, 30), (40, 50, 60), (70, 80, 90))
    val bytes = MediaCodecs.encodeImageIO("png", 3, 2, (x, y) => px(y * 3 + x))
    assert((bytes(1) & 0xff) == 'P' && (bytes(2) & 0xff) == 'N') // PNG magic
    val img = MediaCodecs.decodeImage(bytes)
    assert(img.width == 3 && img.height == 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(img.pixel(x, y) == px(y * 3 + x), s"($x,$y)")
  }

  test("JPEG decode is deterministic and faithful within lossy tolerance") {
    val w = 24; val h = 18
    // Smooth gradient — JPEG's favorable case, tight tolerance meaningful.
    val px = (x: Int, y: Int) => (x * 10, y * 12, (x + y) * 5)
    val bytes = MediaCodecs.encodeImageIO("jpg", w, h, px)
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) // JFIF magic
    val a = MediaCodecs.decodeImage(bytes)
    val b = MediaCodecs.decodeImage(bytes)
    assert(a.width == w && a.height == h)
    assert(java.util.Arrays.equals(a.rgb, b.rgb), "JPEG decode not deterministic")
    // Mean per-channel error under 8/255 on a smooth gradient.
    var err = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r0, g0, b0) = px(x, y)
      val (r1, g1, b1) = a.pixel(x, y)
      err += math.abs(r0 - r1) + math.abs(g0 - g1) + math.abs(b0 - b1)
    }
    val meanErr = err.toDouble / (w * h * 3)
    assert(meanErr < 8.0, s"mean per-channel JPEG error $meanErr")
  }

  test("GIF (LZW, palette) encode/decode: dims exact, deterministic, quantization-bounded") {
    val w = 20; val h = 15
    val px = (x: Int, y: Int) => (x * 12, y * 16, (x + y) * 7)
    val bytes = MediaCodecs.encodeImageIO("gif", w, h, px)
    assert(new String(bytes.take(3), "US-ASCII") == "GIF")
    val a = MediaCodecs.decodeImage(bytes)
    val b = MediaCodecs.decodeImage(bytes)
    assert(a.width == w && a.height == h)
    assert(java.util.Arrays.equals(a.rgb, b.rgb), "GIF decode not deterministic")
    // 256-color palette quantization of a smooth gradient: bounded error.
    var err = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r0, g0, b0) = px(x, y)
      val (r1, g1, b1) = a.pixel(x, y)
      err += math.abs(r0 - r1) + math.abs(g0 - g1) + math.abs(b0 - b1)
    }
    assert(err.toDouble / (w * h * 3) < 20.0,
      s"mean per-channel GIF error ${err.toDouble / (w * h * 3)}")
  }

  test("JPEG/PNG rows flow through the full Spark path: features, format-preserving resize") {
    val media = Multimodal.synthesize(spark, 4242L, 200L)
    val rows = media.collect()
    val jpegs = rows.filter(_.kind == "jpeg")
    val pngs = rows.filter(_.kind == "png")
    assert(jpegs.nonEmpty && pngs.nonEmpty)
    assert(rows.exists(_.kind == "gif"))
    // PNG payloads decode EXACTLY to the synthesizer's pixel function.
    pngs.take(5).foreach { r =>
      val img = MediaCodecs.decodeImage(r.payload)
      assert(img.width == r.width && img.height == r.height)
      val v = graft.synth.Rng.at(4242L, r.media_id, 100L)
      assert(img.pixel(0, 0) == (((v & 0xff).toInt,
        ((v >>> 8) & 0xff).toInt, ((v >>> 16) & 0xff).toInt)))
    }
    // Features extract for every row, all five kinds.
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 200)
    assert(feats.map(_.kind).toSet ==
      Set("image", "jpeg", "png", "gif", "audio", "video"))
    // Resize preserves each row's FORMAT (no silent transcode).
    val resized = Multimodal.resize(media, 8).collect()
    resized.filter(r => r.kind == "jpeg" && math.max(r.width, r.height) <= 8)
      .take(3).foreach { r =>
        assert((r.payload(0) & 0xff) == 0xff && (r.payload(1) & 0xff) == 0xd8)
        val img = MediaCodecs.decodeImage(r.payload)
        assert(img.width == r.width && img.height == r.height)
      }
    resized.filter(_.kind == "png").take(3).foreach { r =>
      assert((r.payload(1) & 0xff) == 'P')
      assert(math.max(r.width, r.height) <= 8)
    }
  }

  test("G.711 µ-law/A-law: known vectors, companding round-trip, WAV expansion") {
    // ITU-T known vectors: µ-law 0xFF is linear 0; A-law 0xD5 (^0x55 =
    // 0x80: sign bit SET = positive, segment 0, mantissa 0) is +8.
    assert(MediaCodecs.decodeG711(0xff.toByte, aLaw = false) == 0)
    assert(MediaCodecs.decodeG711(0xd5.toByte, aLaw = true) == 8)
    // Sign symmetry: flipping the sign bit negates the decoded value.
    for (b <- 0 until 128) {
      assert(MediaCodecs.decodeG711(b.toByte, aLaw = false) ==
        -MediaCodecs.decodeG711((b | 0x80).toByte, aLaw = false).toInt)
      assert(MediaCodecs.decodeG711(b.toByte, aLaw = true) ==
        -MediaCodecs.decodeG711((b | 0x80).toByte, aLaw = true).toInt)
    }
    // Companding round-trip: log quantization error bounded by half the
    // top-segment step (512 µ-law / 512 A-law at 16-bit scale), and tight
    // (≤ 4 / ≤ 8) at small amplitudes — the defining G.711 property.
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000; aLaw <- Seq(false, true)) {
      val x = (rnd.nextInt(64000) - 32000).toShort
      val back = MediaCodecs.decodeG711(MediaCodecs.encodeG711(x, aLaw), aLaw)
      assert(math.abs(back - x) <= 520, s"x=$x back=$back aLaw=$aLaw")
    }
    for (x <- -100 to 100) {
      val backU = MediaCodecs.decodeG711(
        MediaCodecs.encodeG711(x.toShort, aLaw = false), aLaw = false)
      assert(math.abs(backU - x) <= 4, s"µ-law small-amp x=$x back=$backU")
      val backA = MediaCodecs.decodeG711(
        MediaCodecs.encodeG711(x.toShort, aLaw = true), aLaw = true)
      assert(math.abs(backA - x) <= 8, s"A-law small-amp x=$x back=$backA")
    }
    // WAV G.711 containers expand EXACTLY to the per-codeword table values.
    val src = Array.tabulate(300)(j => ((j * 431) % 30000 - 15000).toShort)
    for (aLaw <- Seq(false, true)) {
      val wavBytes = MediaCodecs.encodeWavG711(8000, 1, src, aLaw)
      val wav = MediaCodecs.decodeWavPcm16(wavBytes)
      assert(wav.sampleRate == 8000 && wav.samples.length == 300)
      val expected = src.map(s =>
        MediaCodecs.decodeG711(MediaCodecs.encodeG711(s, aLaw), aLaw))
      assert(java.util.Arrays.equals(wav.samples, expected))
    }
    // Synthesized G.711 rows flow through the audio kernel: RMS close to
    // the PCM encoding of the same source (companding error only).
    val pcm = Multimodal.audioFeatures(
      MediaCodecs.encodeWavPcm16(8000, 1, src), 8)
    val ulaw = Multimodal.audioFeatures(
      MediaCodecs.encodeWavG711(8000, 1, src, aLaw = false), 8)
    assert(math.abs(pcm(0) - ulaw(0)) < 0.01f, s"RMS ${pcm(0)} vs ${ulaw(0)}")
  }

  test("corrupt payload in a batch quarantines the row; the batch completes") {
    import spark.implicits._
    val good = Multimodal.synthesize(spark, 4242L, 30L).collect().toSeq
    // Three corruption shapes: truncated header, bad magic, empty payload.
    // A crafted PNG whose header declares raster-overflow dimensions: the
    // header-first plausibility guard must quarantine it BEFORE any
    // allocation (not OOM inside ImageIO).
    val hugePng: Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      val ihdr = java.nio.ByteBuffer.allocate(25)
      ihdr.putInt(13).put("IHDR".getBytes("US-ASCII"))
        .putInt(100000).putInt(100000) // 3e10 bytes of raster
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .putInt(0) // bogus CRC — header probe doesn't verify it
      out.write(ihdr.array()); out.toByteArray
    }
    val bad = Seq(
      good.head.copy(media_id = 9001L, payload = good.head.payload.take(8)),
      good.head.copy(media_id = 9002L,
        payload = Array.fill[Byte](64)(0x5a)),
      good.head.copy(media_id = 9003L, payload = Array.emptyByteArray),
      good.head.copy(media_id = 9004L, kind = "png", payload = hugePng))
    val mixed = spark.createDataset(good ++ bad).repartition(4)
    val results = Multimodal.extractFeaturesQuarantined(mixed).collect()
    assert(results.length == 34) // every row accounted for — batch completed
    val q = results.filter(_.error != null)
    assert(q.map(_.media_id).sorted.toSeq == Seq(9001L, 9002L, 9003L, 9004L),
      s"quarantined: ${q.map(r => r.media_id -> r.error).toSeq}")
    assert(q.forall(r => r.feature == null && r.error.contains("failed to decode")))
    // Healthy rows produced identical features to the strict path.
    val okFeats = Multimodal.features(
      Multimodal.extractFeaturesQuarantined(mixed))
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    val strict = Multimodal.extractFeatures(
      Multimodal.synthesize(spark, 4242L, 30L))
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(okFeats == strict)
    // The STRICT path surfaces the same failure as the typed GraftError.
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark.createDataset(bad)).collect()
    }
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(rootCause(e).isInstanceOf[graft.MediaDecodeFailed],
      s"root cause was ${rootCause(e).getClass}")
  }

  test("perceptual dHash: re-encode/resize variants pair, distinct images don't") {
    import graft.ops.{MediaCodecs, Multimodal}
    import graft.ops.Multimodal.MediaRow
    import spark.implicits._
    // A smooth horizontal-gradient scene: structure survives JPEG
    // quantization and downscaling.
    def scene(w: Int, h: Int)(x: Int, y: Int): (Int, Int, Int) = {
      val g = 255 * x / math.max(1, w - 1)
      val b = 255 * y / math.max(1, h - 1)
      (g, (g + b) / 2, b)
    }
    // A structurally different scene (vertical bands).
    def other(w: Int, h: Int)(x: Int, y: Int): (Int, Int, Int) = {
      val v = if ((x / 8) % 2 == 0) 230 else 20
      (v, 255 - v, v / 2)
    }
    val rows = Seq(
      MediaRow(1L, "image", MediaCodecs.encodeBmp(64, 48, scene(64, 48)), 64, 48, 0, 0),
      MediaRow(2L, "jpeg", MediaCodecs.encodeImageIO("jpg", 64, 48, scene(64, 48)), 64, 48, 0, 0),
      MediaRow(3L, "png", MediaCodecs.encodeImageIO("png", 32, 24, scene(32, 24)), 32, 24, 0, 0),
      MediaRow(4L, "image", MediaCodecs.encodeBmp(64, 48, other(64, 48)), 64, 48, 0, 0),
      MediaRow(5L, "image", Array[Byte](1, 2, 3), 0, 0, 0, 0) // corrupt: quarantines out
    )
    val ds = spark.createDataset(rows)
    val hashes = Multimodal.imageDHashes(ds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L, 4L), s"corrupt row must drop: $hashes")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(2L)) <= 6, "JPEG re-encode drifted too far")
    assert(ham(hashes(1L), hashes(3L)) <= 6, "downscaled PNG drifted too far")
    assert(ham(hashes(1L), hashes(4L)) > 6, "distinct scenes must not pair")

    val pairs = Multimodal.imageNearDupPairs(ds, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((2L, 3L)), s"variant cluster incomplete: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"distinct image paired: $pairs")
  }
}
