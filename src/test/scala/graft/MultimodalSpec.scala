package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}
import multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthesize(Sources.documents(spark, sfDir)).cache()

  test("synthesize: payload is binary, metadata struct is typed") {
    val schema = media.schema
    assert(schema("payload").dataType === BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq === Seq("format", "width", "height", "n_bytes"))
    assert(media.filter(col("meta.n_bytes") =!= length(col("payload"))).count() === 0)
  }

  test("decodeFeatures: stubbed decode is exact on a known payload and deterministic") {
    val ds = Multimodal.mediaDataset(spark, Sources.documents(spark, sfDir))
    val feats = Multimodal.decodeFeatures(ds).toDF().cache()
    // cross-check byte_sum against an independent in-plan computation
    val joined = feats.join(media, "media_id")
      .withColumn("expected_first", ascii(col("payload").cast("string")))
    assert(joined.filter(col("first_byte") =!= col("expected_first")).count() === 0)
    assert(joined.filter(col("n_bytes") =!= col("meta.n_bytes")).count() === 0)
    assert(joined.filter(col("n_frames") =!= (floor(col("n_bytes") / 256) + 1)).count() === 0)
    assert(joined.filter(abs(col("mean_byte") * col("n_bytes") - col("byte_sum")) > 1e-6).count() === 0)
    val again = Multimodal.decodeFeatures(ds).toDF()
    assert(feats.exceptAll(again).count() === 0 && again.exceptAll(feats).count() === 0)
  }

  test("resizePlan: thumbnails never exceed maxDim and scale is 1 for small media") {
    val plan = Multimodal.resizePlan(media, 128).cache()
    assert(plan.filter(col("thumb_w") > 128 || col("thumb_h") > 128).count() === 0)
    assert(plan.filter(
      greatest(col("width"), col("height")) <= 128 && col("scale") =!= 1.0).count() === 0)
    assert(plan.filter(col("scale") <= 0 || col("scale") > 1).count() === 0)
  }
}
