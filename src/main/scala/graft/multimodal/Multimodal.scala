package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media metadata carried alongside an opaque binary payload. */
case class MediaMeta(format: String, width: Int, height: Int, n_bytes: Long)

/** One media asset: typed id + opaque bytes + typed metadata — the
  * schema shape for image/audio/video columns in a training-data lake
  * (payload stays an opaque `binary`; everything queryable lives in
  * typed columns). */
case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

/** Output of the (stubbed) decode + feature-extraction pass. */
case class MediaFeatures(media_id: Long, n_bytes: Long, first_byte: Int,
                         byte_sum: Long, n_frames: Int, mean_byte: Double)

/** Output of the REAL image decode: dimensions + exact pixel statistics
  * read back from the decoded raster. */
case class PixelFeatures(media_id: Long, img_w: Int, img_h: Int,
                         n_px: Long, px_sum: Long, px_min: Int, px_max: Int,
                         mean_px: Double)

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted via a per-partition batch pass.
  *
  * TWO codec tiers:
  *  - [[decodeImageFeatures]] is a REAL codec: javax.imageio (JDK-public,
  *    headless-safe) decodes genuine PNG payloads — synthesized by
  *    [[synthesizeImages]] as deterministic formula-patterned grayscale
  *    images, ImageIO-encoded on the executors — and reads exact pixel
  *    statistics back off the raster. The oracle computes the same
  *    statistics from the generating formula, so a hash match proves the
  *    encode→decode round-trip bit-exactly.
  *  - [[decodeStub]] remains the clearly-marked deterministic stand-in
  *    for codecs that are NOT JDK-public (jpeg/ffmpeg/soundfile): byte
  *    statistics over the opaque payload.
  * Either way everything Spark-side is real and load-bearing: the binary
  * schema, the `Dataset[MediaRow]` encoders, the `mapPartitions` batch
  * iteration (the shape a JNI/native codec call needs: one init per
  * partition, not per row), and the pushdown-friendly metadata columns.
  */
object Multimodal {

  /** Deterministic media fixture over `documents`: payload = UTF-8 bytes
    * of the text (stands in for encoded media), format/width/height
    * derived from the id. Mirrored in [[catalogSql]]. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        element_at(array(lit("jpeg"), lit("png"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 6) * 32).cast("int").as("height"),
        length(col("text").cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Typed view of the fixture. */
  def mediaDataset(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    synthesize(docs).as[MediaRow]
  }

  /** THE STUB: where a real codec would decode `payload` (one codec init
    * per partition, then batch decode). The deterministic fake "decodes"
    * the payload into byte statistics so the pipeline stays testable and
    * re-run-stable offline. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      n_bytes = bytes.length.toLong,
      first_byte = if (bytes.nonEmpty) bytes(0) & 0xff else -1,
      byte_sum = sum,
      // fake frame sampling: one "frame" per 256 payload bytes
      n_frames = bytes.length / 256 + 1,
      mean_byte = if (bytes.nonEmpty) sum.toDouble / bytes.length else 0.0)
  }

  /** Decode + feature-extract: per-partition batch iteration (the real
    * codec boundary), executor-parallel, no shuffle. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: init decoder context here, once per partition
      rows.map(decodeStub)
    }
  }

  // ------------------------------------------------- real PNG codec path

  /** The deterministic pixel pattern: gray(id, x, y) — every pixel value
    * is a pure integer formula, so the oracle can compute exact pixel
    * statistics WITHOUT a decoder. */
  def patternPx(id: Long, x: Int, y: Int): Int =
    (((7 * id + 31 * x + 101 * y) % 256).toInt + 256) % 256

  /** Image geometry for the PNG fixture (small on purpose — the oracle
    * enumerates pixels). Negative ids are rejected up front (the
    * sourcedDocs guard style): a negative id would yield non-positive
    * dimensions here (BufferedImage throws opaquely) and the SQL oracle's
    * plain `%` would diverge from [[patternPx]]'s normalized modulo. */
  def pngDims(id: Long): (Int, Int) = {
    require(id >= 0, s"media id must be non-negative for the image fixture, got $id")
    ((16 + (id % 8) * 8).toInt, (16 + (id % 6) * 8).toInt)
  }

  /** ENCODE a real 8-bit grayscale PNG of the pattern. Runs on the
    * executors (ImageIO is headless-safe; the in-memory cache flag is
    * per-JVM). */
  def encodePng(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, patternPx(id, x, y)); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Media fixture with GENUINE PNG payloads: one real encoded image per
    * doc, metadata carrying the declared geometry. The encode runs
    * distributed (mapPartitions — one ImageIO config per partition). */
  def synthesizeImages(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      ids.map { id =>
        val (w, h) = pngDims(id)
        val bytes = encodePng(id)
        MediaRow(id, bytes, MediaMeta("png", w, h, bytes.length.toLong))
      }
    }
  }

  /** REAL DECODE: javax.imageio reads the PNG payload back into a raster;
    * features are exact integer pixel statistics (+ one final IEEE mean).
    * Per-partition batch boundary, executor-parallel, no shuffle — the
    * production shape for any JNI/native codec. */
  def decodeImageFeatures(media: Dataset[MediaRow]): Dataset[PixelFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"media ${r.media_id}: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var (sum, mn, mx) = (0L, 256, -1)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        PixelFeatures(r.media_id, w, h, n, sum, mn, mx, sum.toDouble / n)
      }
    }
  }

  // ------------------------------------- JPEG codec + quarantine boundary

  /** ENCODE a real image of the given pixel function in `format`
    * ("png"/"jpg") — the shared executor-side encoder behind both codec
    * fixtures. */
  def encodeImage(id: Long, w: Int, h: Int, format: String,
                  px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, px(x, y)); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  /** Uniform gray level of the JPEG fixture: a DC-only image, so the
    * lossy round-trip error is bounded by DC quantization (±3 gray
    * levels is generous; MultimodalSpec measures the actual error). */
  def jpegGray(id: Long): Int = ((id % 256) + 256).toInt % 256

  /** Media fixture with GENUINE JPEG payloads — the second codec through
    * the same mapPartitions boundary. Uniform-gray images: JPEG is
    * lossy, so the fixture is chosen DC-only to make the decode error
    * provably small; the query asserts the tolerance in-dataflow and
    * emits only formula-exact columns (the approx-percentile oracle
    * discipline). */
  def synthesizeJpegs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { id =>
        val (w, h) = pngDims(id)
        val g = jpegGray(id)
        val bytes = encodeImage(id, w, h, "jpg", (_, _) => g)
        MediaRow(id, bytes, MediaMeta("jpeg", w, h, bytes.length.toLong))
      }
    }
  }

  /** One decoded-or-quarantined media row: `status` = "ok" with pixel
    * features, or "corrupt" with the decoder's error class and null
    * features. */
  case class DecodedMedia(media_id: Long, status: String, err_class: String,
                          img_w: Option[Int], img_h: Option[Int],
                          n_px: Option[Long], px_sum: Option[Long],
                          mean_px: Option[Double])

  /** QUARANTINE-SAFE decode — the 100 TB reality: at corpus scale some
    * payloads are truncated, mislabeled, or not images at all, and a
    * decode failure must become a ROW (routed to a quarantine sink for
    * re-fetch/triage), never a task failure that kills the stage after
    * four retries. Same per-partition batch boundary as
    * [[decodeImageFeatures]]; every throwable from the codec is caught
    * per row and folded into `status`/`err_class`. */
  def decodeImageFeaturesSafe(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null)
            DecodedMedia(r.media_id, "corrupt", "undecodable",
              None, None, None, None, None)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            val n = w.toLong * h
            DecodedMedia(r.media_id, "ok", "", Some(w), Some(h), Some(n),
              Some(sum), Some(sum.toDouble / n))
          }
        } catch {
          // NonFatal only: a corrupt payload throws IIOException /
          // RuntimeException from the codec and becomes a quarantine data
          // row, but fatal JVM errors (OutOfMemoryError) and task-kill
          // interrupts must propagate — folding those into
          // status='corrupt' would record an infrastructure failure as
          // bad media and impede Spark task cancellation.
          case scala.util.control.NonFatal(e) =>
            DecodedMedia(r.media_id, "corrupt", e.getClass.getSimpleName,
              None, None, None, None, None)
        }
      }
    }
  }

  /** Deterministic corruption rule for the quarantine fixture: payloads
    * of ids ≡ 3 (mod 7) are truncated to 10 bytes (a torn upload —
    * valid magic, missing body). Mirrored in [[quarantineSql]]. */
  def corruptSome(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.media_id % 7 == 3) r.copy(payload = r.payload.take(10))
      else r
    }
  }

  /** DuckDB mirror of the quarantined PNG decode: ok rows carry the
    * formula-exact pixel statistics (PNG is lossless), corrupt rows
    * (the mod-7 truncation rule) carry nulls. */
  def quarantineSql(docsRel: String): String =
    s"""WITH dims AS MATERIALIZED (
       |  SELECT doc_id AS media_id,
       |    CAST(16 + (doc_id % 8) * 8 AS INTEGER) AS img_w,
       |    CAST(16 + (doc_id % 6) * 8 AS INTEGER) AS img_h
       |  FROM $docsRel),
       |px AS (
       |  SELECT d.media_id, d.img_w, d.img_h,
       |    (7 * d.media_id + 31 * x.x + 101 * y.y) % 256 AS v
       |  FROM dims d
       |  CROSS JOIN LATERAL (SELECT unnest(range(0, d.img_w)) AS x) x
       |  CROSS JOIN LATERAL (SELECT unnest(range(0, d.img_h)) AS y) y),
       |ok AS (
       |  SELECT media_id, img_w, img_h,
       |    CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum
       |  FROM px GROUP BY 1, 2, 3)
       |SELECT media_id,
       |  CASE WHEN media_id % 7 = 3 THEN 'corrupt' ELSE 'ok' END AS status,
       |  CASE WHEN media_id % 7 = 3 THEN NULL ELSE img_w END AS img_w,
       |  CASE WHEN media_id % 7 = 3 THEN NULL ELSE img_h END AS img_h,
       |  CASE WHEN media_id % 7 = 3 THEN NULL ELSE n_px END AS n_px,
       |  CASE WHEN media_id % 7 = 3 THEN NULL ELSE px_sum END AS px_sum
       |FROM ok""".stripMargin

  /** DuckDB mirror of the JPEG decode's FORMULA-EXACT columns (geometry
    * + the uniform gray level + the in-tolerance verdicts the engine
    * asserted in-dataflow). */
  def decodeJpegSql(docsRel: String): String =
    s"""SELECT doc_id AS media_id,
       |  CAST(16 + (doc_id % 8) * 8 AS INTEGER) AS img_w,
       |  CAST(16 + (doc_id % 6) * 8 AS INTEGER) AS img_h,
       |  CAST((16 + (doc_id % 8) * 8) * (16 + (doc_id % 6) * 8) AS BIGINT)
       |    AS n_px,
       |  CAST(doc_id % 256 AS INTEGER) AS gray,
       |  TRUE AS within_tol
       |FROM $docsRel""".stripMargin

  /** DuckDB mirror of [[synthesizeImages]] ∘ [[decodeImageFeatures]] —
    * computed from the generating FORMULA (no decoder in the oracle):
    * a hash match therefore proves the engine's encode→decode round-trip
    * preserved every pixel. */
  def decodePngSql(docsRel: String): String =
    s"""WITH dims AS MATERIALIZED (
       |  SELECT doc_id AS media_id,
       |    CAST(16 + (doc_id % 8) * 8 AS INTEGER) AS img_w,
       |    CAST(16 + (doc_id % 6) * 8 AS INTEGER) AS img_h
       |  FROM $docsRel),
       |px AS (
       |  SELECT d.media_id, d.img_w, d.img_h,
       |    (7 * d.media_id + 31 * x.x + 101 * y.y) % 256 AS v
       |  FROM dims d
       |  CROSS JOIN LATERAL (SELECT unnest(range(0, d.img_w)) AS x) x
       |  CROSS JOIN LATERAL (SELECT unnest(range(0, d.img_h)) AS y) y)
       |SELECT media_id, img_w, img_h,
       |  CAST(count(*) AS BIGINT) AS n_px,
       |  CAST(sum(v) AS BIGINT) AS px_sum,
       |  CAST(min(v) AS INTEGER) AS px_min,
       |  CAST(max(v) AS INTEGER) AS px_max,
       |  CAST(sum(v) AS DOUBLE) / count(*) AS mean_px
       |FROM px GROUP BY 1, 2, 3""".stripMargin

  /** Metadata-level transform (no payload touch): thumbnail geometry +
    * sample-every-k frame plan — the planning half of a resize/sample
    * pipeline, fully oracle-checkable. */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame =
    media.select(
      col("media_id"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      when(greatest(col("meta.width"), col("meta.height")) <= maxDim, lit(1.0))
        .otherwise(lit(maxDim.toDouble) / greatest(col("meta.width"), col("meta.height")))
        .as("scale"),
      // floor before the int cast: Spark's double→int cast truncates but
      // DuckDB's rounds — floor makes both exact
      (floor(col("meta.n_bytes") / lit(256)) + 1).cast("int").as("n_frames"))
      .withColumn("thumb_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("thumb_h", floor(col("height") * col("scale")).cast("int"))

  /** Frame-SAMPLING work list for video-shaped assets: one row per frame
    * a decode stage should extract — (media_id, sample instant, source
    * frame index, byte offset). This is the planning half of video
    * ingestion: the per-frame rows fan out to the codec boundary
    * ([[decodeFeatures]]-shaped batch decode), and because the ladder is
    * a pure per-row `explode(sequence(...))` the plan is shuffle-free and
    * embarrassingly parallel at any corpus size. Duration/fps stand in
    * for probed container metadata (deterministic functions of the
    * fixture id — a real lake stores them as typed columns, same plan);
    * frame_idx = ⌊sample_ms·fps/1000⌋ all-integer on both engines. */
  def frameSamplePlan(media: DataFrame, stepMs: Int): DataFrame =
    media.select(
      col("media_id"),
      col("meta.format").as("format"),
      col("meta.n_bytes").as("n_bytes"))
      // fake probe: 1 payload byte ≈ 1 ms of media; 10/15/20/25 fps by id
      .withColumn("duration_ms", col("n_bytes"))
      .withColumn("fps", (lit(10) + (col("media_id") % 4) * lit(5)).cast("int"))
      .filter(col("duration_ms") > 0)
      .withColumn("sample_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(stepMs.toLong))))
      .withColumn("frame_idx", expr("(sample_ms * fps) DIV 1000"))
      .withColumn("byte_offset", col("sample_ms")) // 1 byte/ms fake codec
      .select("media_id", "format", "fps", "duration_ms", "sample_ms",
        "frame_idx", "byte_offset")

  /** DuckDB mirror of [[synthesize]] ∘ [[frameSamplePlan]]. */
  def frameSampleSql(docsRel: String, stepMs: Int): String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    ['jpeg', 'png', 'wav'][CAST(doc_id % 3 + 1 AS INTEGER)] AS format,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS duration_ms,
       |    CAST(10 + (doc_id % 4) * 5 AS INTEGER) AS fps
       |  FROM $docsRel
       |  WHERE octet_length(encode(text)) > 0)
       |SELECT media_id, format, fps, duration_ms,
       |  unnest(range(0, duration_ms, $stepMs)) AS sample_ms,
       |  (unnest(range(0, duration_ms, $stepMs)) * fps) // 1000 AS frame_idx,
       |  unnest(range(0, duration_ms, $stepMs)) AS byte_offset
       |FROM m""".stripMargin

  /** Sliding feature-WINDOW accounting for audio-shaped assets — the
    * (win, hop) frame arithmetic every fbank/wav2vec front end runs,
    * audited per asset instead of exploded (the window count is the
    * work-list size; the decode itself stays at the codec boundary).
    * Entirely row-local: no shuffle at any corpus size. */
  def audioWindowPlan(media: DataFrame, win: Int, hop: Int): DataFrame =
    media.select(
      col("media_id"),
      col("meta.format").as("format"),
      col("meta.n_bytes").as("n_samples"))
      // fake probe: 1 payload byte ≈ 1 sample; 8/12/16 kHz by id
      .withColumn("sample_rate", (lit(8000) + (col("media_id") % 3) * lit(4000)).cast("int"))
      .withColumn("n_windows",
        when(col("n_samples") < win, lit(0L))
          .otherwise(expr(s"(n_samples - $win) DIV $hop") + 1))
      .withColumn("last_start",
        when(col("n_windows") === 0, lit(null).cast("long"))
          .otherwise((col("n_windows") - 1) * hop))
      .withColumn("covered_samples",
        when(col("n_windows") === 0, lit(0L))
          .otherwise(col("last_start") + win))
      .withColumn("tail_samples", col("n_samples") - col("covered_samples"))
      // duration in µs: all-integer (samples·1e6)/rate floor division
      .withColumn("duration_us", expr("(n_samples * 1000000) DIV sample_rate"))
      .select("media_id", "format", "n_samples", "sample_rate", "n_windows",
        "last_start", "covered_samples", "tail_samples", "duration_us")

  /** DuckDB mirror of [[synthesize]] ∘ [[audioWindowPlan]]. */
  def audioWindowSql(docsRel: String, win: Int, hop: Int): String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    ['jpeg', 'png', 'wav'][CAST(doc_id % 3 + 1 AS INTEGER)] AS format,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
       |    CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate
       |  FROM $docsRel),
       |w AS (
       |  SELECT *,
       |    CASE WHEN n_samples < $win THEN 0
       |         ELSE (n_samples - $win) // $hop + 1 END AS n_windows
       |  FROM m),
       |x AS (
       |  SELECT *,
       |    CASE WHEN n_windows = 0 THEN NULL
       |         ELSE (n_windows - 1) * $hop END AS last_start
       |  FROM w)
       |SELECT media_id, format, n_samples, sample_rate, n_windows, last_start,
       |  CASE WHEN n_windows = 0 THEN 0 ELSE last_start + $win END AS covered_samples,
       |  n_samples - (CASE WHEN n_windows = 0 THEN 0 ELSE last_start + $win END)
       |    AS tail_samples,
       |  (n_samples * 1000000) // sample_rate AS duration_us
       |FROM x""".stripMargin

  // --------------------------------------------------------------- oracle

  /** DuckDB mirror of [[synthesize]] ∘ [[resizePlan]]. */
  def catalogSql(docsRel: String, maxDim: Int): String =
    s"""SELECT doc_id AS media_id,
       |  ['jpeg', 'png', 'wav'][CAST(doc_id % 3 + 1 AS INTEGER)] AS format,
       |  CAST(64 + (doc_id % 8) * 32 AS INTEGER) AS width,
       |  CAST(64 + (doc_id % 6) * 32 AS INTEGER) AS height,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  md5(text) AS payload_md5,
       |  CASE WHEN greatest(64 + (doc_id % 8) * 32, 64 + (doc_id % 6) * 32) <= $maxDim
       |       THEN 1.0
       |       ELSE CAST($maxDim AS DOUBLE) / greatest(64 + (doc_id % 8) * 32, 64 + (doc_id % 6) * 32)
       |  END AS scale,
       |  CAST(floor(octet_length(encode(text)) / 256) + 1 AS INTEGER) AS n_frames,
       |  CAST(floor((64 + (doc_id % 8) * 32) * (CASE WHEN greatest(64 + (doc_id % 8) * 32, 64 + (doc_id % 6) * 32) <= $maxDim THEN 1.0 ELSE CAST($maxDim AS DOUBLE) / greatest(64 + (doc_id % 8) * 32, 64 + (doc_id % 6) * 32) END)) AS INTEGER) AS thumb_w,
       |  CAST(floor((64 + (doc_id % 6) * 32) * (CASE WHEN greatest(64 + (doc_id % 8) * 32, 64 + (doc_id % 6) * 32) <= $maxDim THEN 1.0 ELSE CAST($maxDim AS DOUBLE) / greatest(64 + (doc_id % 8) * 32, 64 + (doc_id % 6) * 32) END)) AS INTEGER) AS thumb_h
       |FROM $docsRel""".stripMargin
}
