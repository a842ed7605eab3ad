package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("synthetic media table has the contract schema and deterministic payloads") {
    val m = Multimodal.syntheticMedia(spark, 30)
    assert(m.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    val p1 = m.filter(col("media_id") === 7).select("payload").as[Array[Byte]].head()
    val p2 = Multimodal.syntheticMedia(spark, 30)
      .filter(col("media_id") === 7).select("payload").as[Array[Byte]].head()
    assert(p1.toSeq == p2.toSeq && p1.length == 256)
  }

  test("partition-wise feature extraction: one row per media, fixed dim, " +
      "mean matches raster") {
    val m = Multimodal.syntheticMedia(spark, 50).repartition(4)
    val f = Multimodal.extractFeatures(m, dim = 16)
    assert(f.count() == 50)
    val row = f.filter(col("media_id") === 3)
      .select("n_bytes", "mean_intensity", "features")
      .as[(Int, Double, Array[Float])].head()
    assert(row._1 == 256)
    assert(row._2 > 0.0 && row._2 < 1.0)
    assert(row._3.length == 16)
    // mean must equal the stub raster's mean, independent of partitioning
    val payload = m.filter(col("media_id") === 3).select("payload").as[Array[Byte]].head()
    val raster = Multimodal.decodeImageStub(payload, 16, 16)
    assert(math.abs(row._2 - raster.map(_.toDouble).sum / raster.length) < 1e-9)
  }

  test("frame sampling explodes video rows only, at the requested cadence") {
    val m = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(m, everyMs = 1000)
    val kinds = m.filter(col("kind") === "video").count()
    assert(frames.select("media_id").distinct().count() == kinds)
    val one = frames.filter(col("media_id") === 2)
      .select("frame_offset_ms").as[Long].collect().sorted
    assert(one.headOption.contains(0L))
    assert(one.zip(one.tail).forall { case (a, b) => b - a == 1000L })
  }
}
