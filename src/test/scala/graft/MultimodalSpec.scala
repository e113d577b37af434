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

  test("jpeg codec: uniform-gray round-trip error stays within the asserted tolerance") {
    val decoded = Multimodal.decodeImageFeaturesSafe(
      Multimodal.synthesizeJpegs(Sources.documents(spark, sfDir).limit(40)))
      .collect()
    assert(decoded.nonEmpty)
    decoded.foreach { d =>
      assert(d.status == "ok", s"media ${d.media_id}: ${d.err_class}")
      val (w, h) = Multimodal.pngDims(d.media_id)
      assert(d.img_w.contains(w) && d.img_h.contains(h))
      val g = Multimodal.jpegGray(d.media_id)
      // the query asserts ±3 in-dataflow; measure the real drift here
      assert(math.abs(d.mean_px.get - g) <= 3.0,
        s"media ${d.media_id}: gray $g decoded to mean ${d.mean_px.get}")
    }
  }

  test("quarantine: corrupt payloads become rows, never task failures") {
    import spark.implicits._
    val good = Multimodal.synthesizeImages(Sources.documents(spark, sfDir).limit(30))
    // three corruption shapes: truncation, garbage bytes, empty payload
    val mangled = good.map { r =>
      if (r.media_id % 3 == 0) r.copy(payload = r.payload.take(10))
      else if (r.media_id % 3 == 1) r.copy(payload = Array.fill[Byte](64)(0x5a))
      else r
    }
    val out = Multimodal.decodeImageFeaturesSafe(mangled).collect()
    assert(out.length == 30) // every payload produced exactly one row
    out.foreach { d =>
      if (d.media_id % 3 == 2) {
        assert(d.status == "ok" && d.px_sum.nonEmpty)
        val (w, h) = Multimodal.pngDims(d.media_id)
        val sum = (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.patternPx(d.media_id, x, y).toLong).sum
        assert(d.px_sum.contains(sum))
      } else
        assert(d.status == "corrupt" && d.px_sum.isEmpty && d.img_w.isEmpty,
          s"media ${d.media_id} should have quarantined")
    }
    // the empty payload too
    val empty = Seq(MediaRow(5L, Array.empty[Byte], MediaMeta("png", 0, 0, 0L))).toDS()
    assert(Multimodal.decodeImageFeaturesSafe(empty).collect()
      .forall(_.status == "corrupt"))
  }

  test("pngDims rejects negative ids (oracle modulo divergence guard)") {
    val e = intercept[IllegalArgumentException] { Multimodal.pngDims(-1L) }
    assert(e.getMessage.contains("non-negative"))
  }

  test("resizePlan: thumbnails never exceed maxDim and scale is 1 for small media") {
    val plan = Multimodal.resizePlan(media, 128).cache()
    assert(plan.filter(col("thumb_w") > 128 || col("thumb_h") > 128).count() === 0)
    assert(plan.filter(
      greatest(col("width"), col("height")) <= 128 && col("scale") =!= 1.0).count() === 0)
    assert(plan.filter(col("scale") <= 0 || col("scale") > 1).count() === 0)
  }
}
