package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}
import multimodal.{MediaMeta, MediaRow, Multimodal, PixelFeatures}

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

  test("decodeImageFeatures: a REAL PNG decodes to exact known pixels") {
    // Hand-built 2×2 grayscale PNG with pixel values 10, 20, 30, 40 —
    // the decode must read exactly those back off the raster.
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 10); img.getRaster.setSample(1, 0, 0, 20)
    img.getRaster.setSample(0, 1, 0, 30); img.getRaster.setSample(1, 1, 0, 40)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val bytes = baos.toByteArray
    // PNG magic: this really is an encoded image, not raw bytes.
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte)
    import spark.implicits._
    val one = Seq(MediaRow(7L, bytes, MediaMeta("png", 2, 2, bytes.length.toLong)))
      .toDS()
    val f = Multimodal.decodeImageFeatures(one).collect().head
    assert(f == PixelFeatures(7L, 2, 2, 4L, 100L, 10, 40, 25.0), s"got $f")
  }

  test("synthesizeImages ∘ decodeImageFeatures: round-trip matches the formula") {
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.synthesizeImages(Sources.documents(spark, sfDir).limit(40)))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val (w, h) = Multimodal.pngDims(f.media_id)
      val px = for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.patternPx(f.media_id, x, y)
      assert(f.img_w == w && f.img_h == h)
      assert(f.px_sum == px.map(_.toLong).sum, s"media ${f.media_id}: pixel sum drifted")
      assert(f.px_min == px.min && f.px_max == px.max)
    }
  }

  test("resizePlan: thumbnails never exceed maxDim and scale is 1 for small media") {
    val plan = Multimodal.resizePlan(media, 128).cache()
    assert(plan.filter(col("thumb_w") > 128 || col("thumb_h") > 128).count() === 0)
    assert(plan.filter(
      greatest(col("width"), col("height")) <= 128 && col("scale") =!= 1.0).count() === 0)
    assert(plan.filter(col("scale") <= 0 || col("scale") > 1).count() === 0)
  }
}
