package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** [EXT] Multimodal-column operators: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extract / frame-sample as partition-local batch kernels.
  *
  * The actual codec is STUBBED (`DecodeStub` — no image/audio libraries in
  * this environment): it derives deterministic pseudo-metadata and a
  * feature vector purely from the bytes. Everything around the stub is
  * real and load-bearing at scale:
  *  - schema: `MediaFile` (binary payload + declared metadata map) →
  *    `MediaFeatures` (typed metadata + float feature vector)
  *  - execution shape: `Dataset.mapPartitions` with explicit micro-batches
  *    (`batchSize`), the JVM analog of `mapInPandas` — per-partition
  *    columnar-ish batching, no shuffle, codec state reused across a batch
  *  - partitioning: repartition by byte budget before the decode stage so
  *    one giant video cannot skew an executor
  *  - frame sampling: one row per sampled frame via flatMap (generator
  *    shape), keyed so downstream joins stay co-partitioned by media_id
  */
object MultimodalOps {

  case class MediaFile(media_id: Long, kind: String, content: Array[Byte],
      declared_meta: Map[String, String])

  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, decode_ok: Boolean,
      feature: Array[Float])

  case class FrameSample(media_id: Long, frame_idx: Int, frame_sig: Long)

  /** STUB codec — stands in for a real image/audio decoder. Deterministic
    * pure function of the bytes so tests and oracles can reproduce it:
    * pretend dimensions come from the byte length and the "feature" is a
    * normalized byte histogram (16 bins). A real deployment swaps only
    * this object. */
  object DecodeStub {
    def dims(len: Long): (Int, Int, Int) = {
      val width = 1 + (len % 64).toInt
      val height = 1 + ((len / 64) % 64).toInt
      val frames = 1 + (len % 8).toInt
      (width, height, frames)
    }
    def decode(m: MediaFile): MediaFeatures = {
      val len = if (m.content == null) 0L else m.content.length.toLong
      val ok = len > 0
      val (w, h, f) = dims(len)
      val hist = new Array[Float](16)
      if (ok) {
        m.content.foreach(b => hist((b & 0xFF) % 16) += 1f)
        var i = 0
        while (i < 16) { hist(i) /= len; i += 1 }
      }
      MediaFeatures(m.media_id, m.kind, len, w, h, f, ok, hist)
    }
    def frameSig(m: MediaFile, idx: Int): Long = {
      // rolling-hash "frame signature" over a stride of the payload
      var s = 1125899906842597L
      var i = idx
      while (i < m.content.length) { s = 31 * s + (m.content(i) & 0xFF); i += 8 }
      s
    }
  }

  /** Decode + feature extraction: partition-local, explicit micro-batches.
    * `batchSize` bounds peak memory per task (batch of payloads decoded
    * together — the `mapInPandas` batch-shape analog). */
  def extractFeatures(media: Dataset[MediaFile], batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would amortize decoder init across this batch
        batch.iterator.map(DecodeStub.decode)
      }
    }
  }

  /** Frame sampling: every k-th frame of each payload becomes a row
    * (generator/flatMap shape; co-partitioned by media_id upstream). */
  def sampleFrames(media: Dataset[MediaFile], everyK: Int = 2)
      : Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val len = if (m.content == null) 0L else m.content.length.toLong
      val (_, _, frames) = DecodeStub.dims(len)
      (0 until frames by everyK).map(i => FrameSample(m.media_id, i,
        DecodeStub.frameSig(m, i)))
    }
  }

  /** Byte-budget repartitioning before decode: media rows vary by orders
    * of magnitude; partition count follows total payload bytes so a few
    * giant files cannot skew one task. */
  def repartitionByBytes(media: Dataset[MediaFile], targetBytesPerPartition: Long)
      : Dataset[MediaFile] = {
    val totalBytes = media.select(sum(length(col("content")))).head().getLong(0)
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    media.repartition(parts)
  }

  /** Documents-as-media adapter: the testdata has no binary media table, so
    * text bytes stand in for payloads (the schema/plumbing is what's under
    * test; the codec is a stub either way). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        col("text").cast("binary").as("content"),
        map(lit("lang"), col("lang"), lit("source"), col("source"))
          .as("declared_meta"))
      .as[MediaFile]
  }

  /** Oracled metadata query: the stub's dimension arithmetic expressed as
    * column expressions (pure function of byte length → portable SQL). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        length(col("text")).cast("long").as("byte_len"))
      .withColumn("width", (lit(1) + col("byte_len") % 64).cast("int"))
      .withColumn("height", (lit(1) + expr("byte_len div 64") % 64).cast("int"))
      .withColumn("n_frames", (lit(1) + col("byte_len") % 8).cast("int"))

  /** Rows-only query (not SQL-expressible — mapPartitions kernel): decoded
    * feature summary per kind. */
  def mediaFeatureSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = extractFeatures(mediaFromDocuments(spark, dir))
    feats.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(when(col("decode_ok"), 1L).otherwise(0L)).as("n_decoded"),
        round(avg(col("byte_len")), 4).as("avg_bytes"),
        round(avg(aggregate(col("feature"), lit(0.0d),
          (acc, x) => acc + x * x)), 6).as("avg_feature_energy"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta"     -> mediaMeta _,
    "q_media_features" -> mediaFeatureSummary _,
  )

  val oracles: Map[String, String] = Map(
    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |  CAST(length(text) AS BIGINT) AS byte_len,
        |  CAST(1 + length(text) % 64 AS INT) AS width,
        |  CAST(1 + (length(text) // 64) % 64 AS INT) AS height,
        |  CAST(1 + length(text) % 8 AS INT) AS n_frames
        |FROM documents""".stripMargin,
    // q_media_features intentionally has no oracle: the decode kernel is a
    // mapPartitions stub, not SQL-expressible — driver records rows>0.
  )
}
