package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.synth.Rng

/** Multimodal (image/audio/video) column handling.
  *
  * Media payloads are opaque `binary` columns with typed metadata — the
  * pattern a 100 TB training pipeline uses: blobs stay columnar in parquet,
  * transforms run batched per partition, and only derived features/frames
  * enter shuffles.
  *
  * Decode kernels, by format:
  *  - image family = 24-bit uncompressed BMP (REAL byte-level decode,
  *    [[MediaCodecs.decodeBmp]]) plus COMPRESSED JPEG, PNG, and GIF through
  *    the JDK's own javax.imageio ([[MediaCodecs.decodeImage]] — no external
  *    codec library); real nearest-neighbor pixel resampling with
  *    format-preserving re-encode, features computed from actual pixels.
  *  - audio = PCM16 WAV — REAL RIFF chunk-walk decode
  *    ([[MediaCodecs.decodeWavPcm16]]), features from actual samples
  *    (RMS, zero-crossing rate, amplitude histogram).
  *  - video = AVI with uncompressed 24-bit DIB frames — REAL RIFF container
  *    walk ([[MediaCodecs.decodeAvi]]): real frame recovery, features from
  *    actual pixels across frames (incl. temporal motion energy), frame
  *    sampling re-encodes real frames as BMP for downstream image stages.
  *
  * Compressed AUDIO/VIDEO codecs (MP3/H.264) remain out of scope: the JDK
  * carries no decoder for them and the sandbox ships no codec libraries;
  * the container/pipeline layer is fully real for all modalities.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image (BMP) | jpeg | png | gif | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int
  )

  final case class MediaFeature(media_id: Long, kind: String,
                                feature: Array[Float])

  /** Per-row outcome of the quarantining extract path: exactly one of
    * `feature` (success) or `error` (decode failure detail) is set.
    */
  final case class MediaResult(media_id: Long, kind: String,
                               feature: Array[Float], error: String)

  final case class Frame(media_id: Long, frame_idx: Int,
                         frame_bytes: Array[Byte])

  /** Deterministic synthetic media table. Image payloads are VALID
    * containers in FOUR formats — 24-bit BMP (hand-rolled encoder), JPEG,
    * PNG, and GIF (JDK ImageIO) — audio payloads are VALID WAVs (PCM16 or
    * G.711-companded), video payloads are VALID uncompressed-DIB AVIs;
    * every one parses byte-for-byte through the real decode kernels.
    */
  def synthesize(spark: SparkSession, seed: Long, n: Long,
                 partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { i =>
      val kind = Vector("image", "jpeg", "png", "gif", "audio", "video")(
        Rng.nextInt(seed, i, 0, 6))
      kind match {
        case "image" | "jpeg" | "png" | "gif" =>
          val w = 4 + Rng.nextInt(seed, i, 2, 28)
          val h = 4 + Rng.nextInt(seed, i, 3, 28)
          val px = (x: Int, y: Int) => {
            val v = Rng.at(seed, i, 100L + y.toLong * w + x)
            ((v & 0xff).toInt, ((v >>> 8) & 0xff).toInt, ((v >>> 16) & 0xff).toInt)
          }
          val payload = kind match {
            case "image" => MediaCodecs.encodeBmp(w, h, px)
            case "jpeg" => MediaCodecs.encodeImageIO("jpg", w, h, px)
            case "png" => MediaCodecs.encodeImageIO("png", w, h, px)
            case _ => MediaCodecs.encodeImageIO("gif", w, h, px) // LZW, palette
          }
          MediaRow(i, kind, payload, w, h, 0, 1)
        case "audio" =>
          val rate = Vector(8000, 16000, 44100)(Rng.nextInt(seed, i, 4, 3))
          val nSamples = 64 + Rng.nextInt(seed, i, 5, 960)
          val samples = Array.tabulate(nSamples)(j =>
            (Rng.at(seed, i, 200L + j) & 0xffffL).toShort)
          // Two in three audio rows carry G.711-companded codewords (µ-law
          // or A-law) — the COMPRESSED telephony format; the decoder
          // expands them to the same 16-bit linear samples PCM rows carry.
          val payload = Rng.nextInt(seed, i, 9, 3) match {
            case 0 => MediaCodecs.encodeWavPcm16(rate, 1, samples)
            case 1 => MediaCodecs.encodeWavG711(rate, 1, samples, aLaw = false)
            case _ => MediaCodecs.encodeWavG711(rate, 1, samples, aLaw = true)
          }
          MediaRow(i, kind, payload, 0, 0, rate, 0)
        case _ =>
          val w = 4 + Rng.nextInt(seed, i, 5, 16)
          val h = 4 + Rng.nextInt(seed, i, 6, 16)
          val nFrames = 4 + Rng.nextInt(seed, i, 7, 12)
          val fps = Vector(10, 25, 30)(Rng.nextInt(seed, i, 8, 3))
          val avi = MediaCodecs.encodeAvi(w, h, fps,
            (0 until nFrames).map { f => (x: Int, y: Int) =>
              val v = Rng.at(seed, i, 1000L + f.toLong * w * h + y.toLong * w + x)
              ((v & 0xff).toInt, ((v >>> 8) & 0xff).toInt, ((v >>> 16) & 0xff).toInt)
            })
          MediaRow(i, kind, avi, w, h, 0, nFrames)
      }
    }
  }

  /** Image features from REAL decoded pixels: mean R/G/B, mean luminance,
    * then a (dim-4)-bin luminance histogram (mass-normalized).
    */
  private[graft] def imageFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val img = MediaCodecs.decodeImage(payload) // BMP, JPEG, PNG, or GIF
    val out = new Array[Float](dim)
    val nPix = img.width * img.height
    val bins = dim - 4
    var i = 0
    while (i < nPix) {
      val r = img.rgb(i * 3) & 0xff
      val g = img.rgb(i * 3 + 1) & 0xff
      val b = img.rgb(i * 3 + 2) & 0xff
      out(0) += r / 255.0f
      out(1) += g / 255.0f
      out(2) += b / 255.0f
      val luma = (r * 299 + g * 587 + b * 114) / 1000 // integer BT.601
      out(3) += luma / 255.0f
      if (bins > 0) out(4 + math.min(bins - 1, luma * bins / 256)) += 1.0f
      i += 1
    }
    var d = 0
    while (d < dim) { out(d) /= nPix; d += 1 }
    out
  }

  /** 64-bit difference hash (dHash) over REAL decoded pixels: area-average
    * the image onto a 9×8 luma grid, set bit (y,x) when cell (y,x+1) is
    * brighter than (y,x). Horizontal gradients survive re-encoding (JPEG
    * quantization), resizing, and brightness shifts — the standard cheap
    * perceptual fingerprint for image near-dup detection.
    */
  private[graft] def dHash(img: MediaCodecs.Bmp): Long = {
    val gw = 9; val gh = 8
    val sums = new Array[Double](gw * gh)
    val counts = new Array[Int](gw * gh)
    var y = 0
    while (y < img.height) {
      val gy = y * gh / img.height
      var x = 0
      while (x < img.width) {
        val gx = x * gw / img.width
        val o = (y * img.width + x) * 3
        val luma = ((img.rgb(o) & 0xff) * 299 + (img.rgb(o + 1) & 0xff) * 587 +
          (img.rgb(o + 2) & 0xff) * 114) / 1000.0
        sums(gy * gw + gx) += luma
        counts(gy * gw + gx) += 1
        x += 1
      }
      y += 1
    }
    val grid = Array.tabulate(gw * gh)(i =>
      if (counts(i) > 0) sums(i) / counts(i) else 0.0)
    var h = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        if (grid(gy * gw + gx + 1) > grid(gy * gw + gx))
          h |= 1L << (gy * (gw - 1) + gx)
        gx += 1
      }
      gy += 1
    }
    h
  }

  /** Per-image perceptual hashes: (media_id, dhash) for every decodable
    * image row (all four container formats); corrupt payloads quarantine
    * out (dropped here — [[extractFeaturesQuarantined]] is the counting
    * path) instead of failing the batch. Narrow map, one decode per image.
    */
  def imageDHashes(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(r => r.kind == "image" || r.kind == "jpeg" ||
        r.kind == "png" || r.kind == "gif")
      .flatMap { r =>
        try Some((r.media_id, dHash(MediaCodecs.decodeImage(r.payload))))
        catch { case scala.util.control.NonFatal(_) => None }
      }.toDF("id", "h")
  }

  /** Image near-dup pairs: perceptual dHash + the pigeonhole-block hamming
    * join ([[Dedup.hammingPairs]] — the same scale shape as simhash text
    * dedup: narrow hash pass, bucket join on hash blocks, bit_count
    * verify; never an all-pairs scan). Returns (ia, ib, hamming).
    */
  def imageNearDupPairs(media: Dataset[MediaRow],
                        maxHamming: Int = 6): DataFrame =
    Dedup.hammingPairs(imageDHashes(media), maxHamming)

  /** Audio features from REAL decoded samples: RMS, zero-crossing rate,
    * mean, peak, then a (dim-4)-bin absolute-amplitude histogram.
    */
  private[graft] def audioFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val wav = MediaCodecs.decodeWavPcm16(payload)
    val out = new Array[Float](dim)
    val n = wav.samples.length
    if (n == 0) return out
    val bins = dim - 4
    var sumSq = 0.0
    var sum = 0.0
    var peak = 0.0f
    var zc = 0
    var i = 0
    while (i < n) {
      val s = wav.samples(i) / 32768.0f
      sumSq += s.toDouble * s
      sum += s
      val a = math.abs(s)
      if (a > peak) peak = a
      if (i > 0 && ((wav.samples(i) >= 0) != (wav.samples(i - 1) >= 0))) zc += 1
      if (bins > 0) out(4 + math.min(bins - 1, (a * bins).toInt)) += 1.0f
      i += 1
    }
    out(0) = math.sqrt(sumSq / n).toFloat
    out(1) = zc.toFloat / n
    out(2) = (sum / n).toFloat
    out(3) = peak
    var d = 4
    while (d < dim) { out(d) /= n; d += 1 }
    out
  }

  /** Video features from REAL decoded AVI frames: mean R/G/B and mean
    * luminance over all frames' pixels, temporal motion energy (mean
    * |Δluma| between consecutive frames), then a (dim-5)-bin luminance
    * histogram — the spatial stats of [[imageFeatures]] plus the temporal
    * axis only video has.
    */
  private[graft] def videoFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    require(dim >= 5,
      s"videoFeatures needs dim >= 5 (4 spatial stats + motion energy): $dim")
    val avi = MediaCodecs.decodeAvi(payload)
    val out = new Array[Float](dim)
    val nPix = avi.width * avi.height
    val bins = dim - 5
    var prevLuma: Array[Int] = null
    var motion = 0.0
    avi.frames.foreach { f =>
      val luma = new Array[Int](nPix)
      var i = 0
      while (i < nPix) {
        val r = f.rgb(i * 3) & 0xff
        val g = f.rgb(i * 3 + 1) & 0xff
        val b = f.rgb(i * 3 + 2) & 0xff
        out(0) += r / 255.0f
        out(1) += g / 255.0f
        out(2) += b / 255.0f
        val l = (r * 299 + g * 587 + b * 114) / 1000
        luma(i) = l
        out(3) += l / 255.0f
        if (bins > 0) out(5 + math.min(bins - 1, l * bins / 256)) += 1.0f
        if (prevLuma != null) motion += math.abs(l - prevLuma(i)) / 255.0
        i += 1
      }
      prevLuma = luma
    }
    // Long/Double arithmetic: nPix(≤ Int.Max/3) × frames overflows Int for
    // ~35 s of 1080p — the decoder accepts such files, so the divisor must
    // not wrap (the motion term below was already written with toLong).
    val total = nPix.toDouble * avi.frames.size
    var d = 0
    while (d < dim) { if (d != 4) out(d) = (out(d) / total).toFloat; d += 1 }
    if (avi.frames.size > 1)
      out(4) = (motion / (nPix.toLong * (avi.frames.size - 1))).toFloat
    out
  }

  /** Batched feature extraction — one "codec" per partition, rows streamed
    * through it (the mapInPandas batch shape). All three kinds go through
    * REAL byte-level decoders.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    // Typed up-front guard: the image/audio kernels index slots 0..3 and
    // video additionally slot 4 — an undersized dim would otherwise surface
    // as an ArrayIndexOutOfBoundsException inside executors, per row.
    if (dim < 5)
      throw new graft.InvalidConfig(
        s"extractFeatures needs dim >= 5 (4 base stats + video motion energy): $dim")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition setup (real pipeline: codec/model init) happens once:
      val codecReady = true
      rows.map { r =>
        require(codecReady)
        MediaFeature(r.media_id, r.kind, decodeOne(r, dim))
      }
    }
  }

  /** One row's feature kernel with decode failures normalized to the typed
    * [[graft.MediaDecodeFailed]] (the codecs raise bare
    * IllegalArgumentExceptions at the byte level).
    */
  private def decodeOne(r: MediaRow, dim: Int): Array[Float] =
    try r.kind match {
      case "image" | "jpeg" | "png" | "gif" => imageFeatures(r.payload, dim)
      case "audio" => audioFeatures(r.payload, dim)
      case _ => videoFeatures(r.payload, dim)
    } catch {
      // EVERY non-fatal decode failure normalizes to the typed error — a
      // fuzzed payload can surface as AIOOBE/underflow/etc. from any
      // parser layer, and at 10^9-row scale each one must be a counted
      // quarantine row, not a dead executor task.
      case e: graft.MediaDecodeFailed => throw e
      case e: IllegalArgumentException =>
        throw new graft.MediaDecodeFailed(r.media_id, r.kind,
          Option(e.getMessage).getOrElse(e.toString))
      case scala.util.control.NonFatal(e) =>
        throw new graft.MediaDecodeFailed(r.media_id, r.kind,
          s"decode failure: $e")
    }

  /** Quarantining twin of [[extractFeatures]] — the 10^9-row shape: a
    * corrupt payload becomes a counted [[MediaResult]] row with `error`
    * set (and `feature` null) instead of failing the batch; healthy rows
    * stream through untouched. Split the outcome with [[features]] /
    * [[quarantined]] — one pass, no driver round-trip, the media twin of
    * the JSONL source's PERMISSIVE-mode quarantine (F1).
    */
  def extractFeaturesQuarantined(media: Dataset[MediaRow],
                                 dim: Int = 16): Dataset[MediaResult] = {
    if (dim < 5)
      throw new graft.InvalidConfig(
        s"extractFeatures needs dim >= 5 (4 base stats + video motion energy): $dim")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        try MediaResult(r.media_id, r.kind, decodeOne(r, dim), null)
        catch {
          case e: graft.MediaDecodeFailed =>
            MediaResult(r.media_id, r.kind, null, e.getMessage)
        }
      }
    }
  }

  /** Successfully-decoded rows of a quarantining extract. */
  def features(results: Dataset[MediaResult]): Dataset[MediaFeature] = {
    val spark = results.sparkSession
    import spark.implicits._
    results.filter(_.error == null)
      .map(r => MediaFeature(r.media_id, r.kind, r.feature))
  }

  /** Quarantined rows of a quarantining extract (id, kind, decode error). */
  def quarantined(results: Dataset[MediaResult]): Dataset[MediaResult] =
    results.filter(_.error != null)

  /** Resize: REAL nearest-neighbor pixel resample + re-encode — images as
    * BMP, video as per-frame resample + AVI re-encode; audio passes
    * through.
    */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      if (r.kind == "audio" || math.max(r.width, r.height) <= maxSide) r
      else {
        val scale = maxSide.toDouble / math.max(r.width, r.height)
        val w = math.max(1, (r.width * scale).toInt)
        val h = math.max(1, (r.height * scale).toInt)
        if (r.kind != "video") {
          // Re-encode in the row's OWN format (BMP stays BMP, JPEG stays
          // JPEG, PNG stays PNG) — a resize must not silently transcode.
          val resampled = MediaCodecs.resampleBmp(
            MediaCodecs.decodeImage(r.payload), w, h)
          val payload = r.kind match {
            case "jpeg" => MediaCodecs.encodeImageIO("jpg", w, h,
              (x, y) => resampled.pixel(x, y))
            case "png" => MediaCodecs.encodeImageIO("png", w, h,
              (x, y) => resampled.pixel(x, y))
            case "gif" => MediaCodecs.encodeImageIO("gif", w, h,
              (x, y) => resampled.pixel(x, y))
            case _ => MediaCodecs.encodeBmp(w, h, (x, y) => resampled.pixel(x, y))
          }
          r.copy(width = w, height = h, payload = payload)
        } else {
          val avi = MediaCodecs.decodeAvi(r.payload)
          val small = avi.frames.map(MediaCodecs.resampleBmp(_, w, h))
          r.copy(width = w, height = h,
            payload = MediaCodecs.encodeAvi(w, h, avi.fps,
              small.map(f => (x: Int, y: Int) => f.pixel(x, y))))
        }
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th REAL decoded frame,
    * re-encoded as a standalone BMP — the exploded (media_id, frame_idx,
    * frame_bytes) shape a caption/CLIP stage consumes, with frame_bytes
    * directly consumable by the image kernels ([[imageFeatures]]).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val avi = MediaCodecs.decodeAvi(r.payload)
      avi.frames.indices.by(stride).zipWithIndex.map { case (f, idx) =>
        val frame = avi.frames(f)
        Frame(r.media_id, idx,
          MediaCodecs.encodeBmp(frame.width, frame.height,
            (x, y) => frame.pixel(x, y)))
      }
    }
  }

  /** Summary used as the queries() entry: per-kind counts + feature norms
    * (deterministic, non-empty).
    */
  def summary(spark: SparkSession, seed: Long = 4242L, n: Long = 300L): DataFrame = {
    import spark.implicits._
    val media = synthesize(spark, seed, n)
    val feats = extractFeatures(media)
    val frames = sampleFrames(media)
    val featAgg = feats.toDF("media_id", "kind", "feature")
      .withColumn("fnorm", round(
        sqrt(aggregate(transform(col("feature"), x => x.cast("double") * x),
          lit(0.0), (a, v) => a + v)), 4))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"), round(avg(col("fnorm")), 4).as("avg_fnorm"))
    val frameAgg = frames.toDF("media_id", "frame_idx", "frame_bytes")
      .agg(count(lit(1)).as("n_frames_total"),
        countDistinct(col("media_id")).as("n_videos"))
    featAgg.crossJoin(frameAgg)
  }
}
