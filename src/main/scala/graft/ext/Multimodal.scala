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
  * The actual codecs are STUBBED (this container ships no image/audio
  * libraries): `decodeImageStub` produces a deterministic fake
  * grayscale raster from the bytes. Everything around the stub — the
  * schema contract, the binary column plumbing, partition-wise batch
  * execution, feature extraction over the decoded frame — is real and
  * tested; swapping in a JNI/javax codec changes one function.
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

  /** STUB decoder: bytes → WxH "grayscale" raster. Deterministic fake
    * (byte i of payload cycled over the raster); a real build replaces
    * the body with an actual image decode. ??? -- intentionally fake.
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
          // per-task decoder "initialization" happens HERE (stub: none)
          rows.map { case (id, kind, payload, w, h) =>
            val raster = decodeImageStub(payload, w, h)
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
