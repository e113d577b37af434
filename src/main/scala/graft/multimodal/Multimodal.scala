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

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted via a per-partition batch pass.
  *
  * The real decode (libjpeg/ffmpeg/soundfile) is NOT available in this
  * environment, so [[decodeStub]] is a clearly-marked deterministic fake —
  * but everything Spark-side is real and load-bearing: the binary schema,
  * the `Dataset[MediaRow]` encoders, the `mapPartitions` batch iteration
  * (the shape a JNI/native codec call needs: one init per partition, not
  * per row), and the pushdown-friendly metadata columns.
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
