package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (driver north-star extension): treat
  * media payloads as opaque `binary` columns with typed metadata, and
  * run decode/feature-extraction as partition-batched functions over
  * a typed Dataset (`mapPartitions` — the Scala analog of
  * `mapInPandas`: one invocation per batch/partition, not per row).
  *
  * The container has no image/audio codecs, so `decodeStub` below is a
  * STUB: a deterministic fake decoder that derives "media metadata"
  * from the bytes themselves. The Spark-side plumbing — binary column
  * handling, schema of the feature struct, partition-batched UDF
  * shape, and partitioning — is real and tested; swapping the stub
  * body for a JNI/libav call changes no plan shape.
  *
  * Scale note: binary payloads ride in the row (parquet BYTE_ARRAY);
  * the decode stage is a narrow map (no shuffle), so it scales
  * linearly with input splits. Feature extraction keeps only the
  * small typed struct, dropping the heavy bytes as early as possible.
  */
object Multimodal {

  /** Typed media row: the binary payload is the "image"; metadata
    * travels alongside (FIXTURES.md: documents.text bytes stand in
    * for media bytes).
    */
  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Extracted features — the schema a real decoder would fill. */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      brightness: Double)

  /** STUB decoder — deterministic fake in place of a real codec
    * (???-equivalent per the driver contract: no media libs in this
    * container). Derives pseudo-metadata purely from the payload
    * bytes, so results are reproducible anywhere.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.media.length.toLong
    // sum of the first 256 bytes — a stand-in for a luminance average
    var i = 0
    var acc = 0L
    val lim = math.min(r.media.length, 256)
    while (i < lim) { acc += (r.media(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = r.doc_id,
      byte_len = n,
      width = 64L + n % 640L,
      height = 64L + n % 480L,
      n_frames = 1L + n % 30L,
      brightness = if (lim == 0) 0.0 else acc.toDouble / lim.toDouble)
  }

  /** Binary-column metadata: pure Catalyst expressions over the bytes
    * (length, digest, deterministic pseudo-metadata) — fully oracled.
    */
  private def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("media", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        length(col("media")).cast("long").as("byte_len"),
        md5(col("media")).as("checksum"),
        (lit(64L) + length(col("media")).cast("long") % 640L).as("width"),
        (lit(64L) + length(col("media")).cast("long") % 480L).as("height"),
        (lit(1L) + length(col("media")).cast("long") % 30L).as("n_frames"))
      .orderBy("doc_id")

  // Partition-batched decode/feature-extract over the typed Dataset —
  // the mapInPandas-shaped path. No oracle (imperative stage); the
  // ScalaTest spec pins the stub's outputs and the batch shape.
  private def qMultimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
    media
      .mapPartitions(it => it.map(decodeStub))
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling: every 3rd frame index of each media payload
    * becomes its own row with a per-frame descriptor — the
    * rate-subsampling shape a video pipeline runs before feature
    * extraction. The 1→N expansion is a generator (explode over the
    * sampled index sequence), the descriptor a digest of the frame's
    * byte window — pure Catalyst, so the whole shape is oracled; a
    * real codec swaps into the descriptor expression only.
    */
  private def qMultimodalFrames(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("len", length(col("text")).cast("long"))
      .withColumn("n_frames", lit(1L) + col("len") % 30L)
      .select(col("doc_id"), col("text"), col("len"),
        explode(expr("sequence(0L, n_frames - 1, 3L)")).as("frame_idx"))
      .withColumn("frame_off",
        lit(1L) + (col("frame_idx") * lit(37L)) % greatest(col("len") - 99L, lit(1L)))
      .select(col("doc_id"), col("frame_idx"), col("frame_off"),
        md5(expr("substring(text, CAST(frame_off AS INT), 100)")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  /** Resize/thumbnail plumbing: emit the reduced-payload descriptor
    * (¼-scale target dims, truncated payload digest + length). The
    * byte-slicing stands in for a scaler kernel; schema and row shape
    * are what a real resize stage produces. Oracled.
    */
  private def qMultimodalResize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("len", length(col("text")).cast("long"))
      .withColumn("thumb_len", expr("(len + 3) DIV 4"))
      .select(
        col("doc_id"), col("len"), col("thumb_len"),
        greatest(expr("(64 + len % 640) DIV 4"), lit(16L)).as("thumb_w"),
        greatest(expr("(64 + len % 480) DIV 4"), lit(16L)).as("thumb_h"),
        md5(expr("substring(text, 1, CAST(thumb_len AS INT))")).as("thumb_md5"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_features" -> (qMultimodalFeatures _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_resize" -> (qMultimodalResize _)
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
        |         1 + CAST(length(text) AS BIGINT) % 30 AS n_frames
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, text, len, unnest(range(0, n_frames, 3)) AS frame_idx FROM f
        |)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST(1 + (frame_idx * 37) % greatest(len - 99, 1) AS BIGINT) AS frame_off,
        |       md5(substring(text,
        |             CAST(1 + (frame_idx * 37) % greatest(len - 99, 1) AS INT), 100)) AS frame_md5
        |FROM s
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_multimodal_resize" ->
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS len,
        |       CAST((length(text) + 3) // 4 AS BIGINT) AS thumb_len,
        |       CAST(greatest((64 + length(text) % 640) // 4, 16) AS BIGINT) AS thumb_w,
        |       CAST(greatest((64 + length(text) % 480) // 4, 16) AS BIGINT) AS thumb_h,
        |       md5(substring(text, 1, CAST((length(text) + 3) // 4 AS INT))) AS thumb_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       md5(text) AS checksum,
        |       64 + CAST(octet_length(encode(text)) AS BIGINT) % 640 AS width,
        |       64 + CAST(octet_length(encode(text)) AS BIGINT) % 480 AS height,
        |       1 + CAST(octet_length(encode(text)) AS BIGINT) % 30 AS n_frames
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
