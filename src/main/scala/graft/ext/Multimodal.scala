package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling (SURVEY.md §2.9 /
  * north star): media travel as opaque `binary` columns with typed
  * metadata; decode / feature-extraction runs per-partition so one
  * task amortizes codec init over a whole batch of rows — the Scala
  * equivalent of `mapInPandas` batch processing.
  *
  * Image decode is REAL: [[decodeImage]] runs the JDK's
  * `javax.imageio.ImageIO` (PNG/JPEG/GIF/BMP — no external codec
  * libraries needed) and resamples to the metadata (w, h) as a
  * normalized grayscale raster. Payloads ImageIO cannot parse (e.g.
  * the synthetic fixture's pseudo-random bytes, or audio/video frames
  * — the container ships no codecs for those) fall back to
  * [[decodeImageStub]], a deterministic fake raster, so the pipeline
  * shape stays total: every row decodes to the same schema either way.
  */
object Multimodal {

  /** Media-row schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Deterministic synthetic media table (test fixture): payload bytes
    * derived from media_id — stands in for real blobs at the same
    * schema. At scale this would be `spark.read.format("binaryFile")`
    * or parquet with a binary column.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("id") % 3 + 1).cast("int")).as("kind"),
      // 256 pseudo-random bytes seeded by id — sha2 chained blocks
      unhex(concat((0 until 8).map(i =>
        sha2(concat(col("id").cast("string"), lit(s"#$i")), 256)): _*)).as("payload"),
      lit("application/octet-stream").as("mime"),
      lit(16).cast("int").as("width"),
      lit(16).cast("int").as("height"),
      (col("id") % 5000 + 1000).as("duration_ms"))

  /** Real image decode + resize: ImageIO parse (format sniffed from the
    * bytes), nearest-neighbor resample to (w, h), BT.601 luma in [0, 1].
    * Returns None when the payload is not a decodable image — callers
    * fall back to the stub raster so non-image payloads never kill a
    * pipeline run (the PERMISSIVE-mode stance, same as the JSONL
    * source).
    */
  def decodeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Float]] = {
    if (payload == null || payload.isEmpty || w <= 0 || h <= 0) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val out = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        val sy = y * img.getHeight / h
        var x = 0
        while (x < w) {
          val sx = x * img.getWidth / w
          val rgb = img.getRGB(sx, sy)
          val r = (rgb >> 16) & 0xFF
          val g = (rgb >> 8) & 0xFF
          val b = rgb & 0xFF
          out(y * w + x) =
            ((0.299f * r + 0.587f * g + 0.114f * b) / 255.0f)
          x += 1
        }
        y += 1
      }
      Some(out)
    }
  }

  /** Fallback decoder for payloads ImageIO cannot parse: bytes → WxH
    * "grayscale" raster, deterministic fake (byte i of payload cycled
    * over the raster). Keeps non-image rows total through the same
    * pipeline shape.
    */
  def decodeImageStub(payload: Array[Byte], w: Int, h: Int): Array[Float] = {
    if (payload == null || payload.isEmpty) return Array.fill(w * h)(0f)
    val out = new Array[Float](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = (payload(i % payload.length) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Feature extraction over media batches: decode + per-frame stats,
    * executed partition-wise (`mapPartitions`) so decoder init happens
    * once per task, not once per row. Output: (media_id, kind,
    * n_bytes, mean_intensity, feature vector).
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out: Dataset[(Long, String, Int, Double, Array[Float])] =
      media.select("media_id", "kind", "payload", "width", "height")
        .as[(Long, String, Array[Byte], Int, Int)]
        .mapPartitions { rows =>
          // per-task decoder init happens HERE, once per partition —
          // ImageIO's reader registry scan is amortized over the batch
          javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in executors
          rows.map { case (id, kind, payload, w, h) =>
            val raster = decodeImage(payload, w, h)
              .getOrElse(decodeImageStub(payload, w, h))
            val nBytes = if (payload == null) 0 else payload.length
            val mean =
              if (raster.isEmpty) 0.0
              else raster.foldLeft(0.0)(_ + _) / raster.length
            // pooled feature vector: dim buckets of mean intensity
            val feat = new Array[Float](dim)
            val bucket = math.max(1, raster.length / dim)
            var i = 0
            while (i < raster.length) {
              feat(math.min(i / bucket, dim - 1)) += raster(i)
              i += 1
            }
            (id, kind, nBytes, mean, feat)
          }
        }
    out.toDF("media_id", "kind", "n_bytes", "mean_intensity", "features")
  }

  /** Frame sampling for video-kind rows: explode duration into every
    * k-th millisecond offset — the schema/partition shape of a frame
    * extractor, with the decode itself stubbed as above.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_offset_ms"))
}
