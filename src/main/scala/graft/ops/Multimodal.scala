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
  * The container ships no image/audio codecs, so the *decode* kernels are
  * STUBS — deterministic fakes clearly marked below — while everything
  * Spark-side is real and tested: schema, partitioning, batch-shaped
  * `mapPartitions` (the Scala analog of `mapInPandas`: one iterator of rows
  * per partition, amortizing per-batch setup such as codec init), explode
  * shape for frame sampling, and feature vectors sized for downstream ANN.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int
  )

  final case class MediaFeature(media_id: Long, kind: String,
                                feature: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int,
                         frame_bytes: Array[Byte])

  /** Deterministic synthetic media table (payload bytes from the counter
    * PRNG; metadata consistent with kind).
    */
  def synthesize(spark: SparkSession, seed: Long, n: Long,
                 partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { i =>
      val kind = Vector("image", "audio", "video")(Rng.nextInt(seed, i, 0, 3))
      val len = 256 + Rng.nextInt(seed, i, 1, 1024)
      val payload = Array.tabulate(len)(j => Rng.at(seed, i, 100L + j).toByte)
      kind match {
        case "image" => MediaRow(i, kind, payload,
          32 + Rng.nextInt(seed, i, 2, 512), 32 + Rng.nextInt(seed, i, 3, 512), 0, 1)
        case "audio" => MediaRow(i, kind, payload, 0, 0,
          Vector(8000, 16000, 44100)(Rng.nextInt(seed, i, 4, 3)), 0)
        case _ => MediaRow(i, kind, payload,
          64 + Rng.nextInt(seed, i, 5, 256), 64 + Rng.nextInt(seed, i, 6, 256), 0,
          4 + Rng.nextInt(seed, i, 7, 28))
      }
    }
  }

  /** STUB decode kernel: a real pipeline would decode the payload with an
    * image/audio codec here. Deterministic fake: 16 float features derived
    * from payload bytes. The mapPartitions batching around it is the real,
    * scale-relevant part (codec init amortized per partition, not per row).
    */
  private def stubDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var d = 0
    while (d < dim) { out(d) = out(d) / math.max(1, payload.length / dim); d += 1 }
    out
  }

  /** Batched feature extraction — one "codec" per partition, rows streamed
    * through it (the mapInPandas batch shape).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition setup (real pipeline: codec/model init) happens once:
      val codecReady = true
      rows.map { r =>
        require(codecReady)
        MediaFeature(r.media_id, r.kind, stubDecodeFeatures(r.payload, dim))
      }
    }
  }

  /** STUB resize: recomputes metadata and truncates the payload
    * proportionally (real pipeline: pixel resample).
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
        val newLen = math.max(16, (r.payload.length * scale * scale).toInt)
        r.copy(width = w, height = h,
          payload = r.payload.take(math.min(newLen, r.payload.length)))
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th 16-byte block of the
    * payload is a "frame" (STUB for keyframe extraction); output is the
    * exploded (media_id, frame_idx, bytes) shape a caption/CLIP stage
    * consumes.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val blockSize = 16
      val nBlocks = r.payload.length / blockSize
      (0 until nBlocks by stride).zipWithIndex.map { case (b, idx) =>
        Frame(r.media_id, idx,
          java.util.Arrays.copyOfRange(r.payload, b * blockSize, (b + 1) * blockSize))
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
