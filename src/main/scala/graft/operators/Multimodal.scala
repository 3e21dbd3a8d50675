package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque binary columns
  * with typed metadata, and batch decode/feature-extract plumbing via
  * mapPartitions over a typed Dataset (the Scala analog of Python's
  * mapInPandas batches).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[StubCodec.decode]] produces deterministic fake
  * features from the bytes. The Spark-side contract — binary schema,
  * partition-wise batching, feature struct shape — is real and
  * spec-tested; swapping the stub for a JNI/JavaCV codec changes no
  * plan shape.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, content: Array[Byte], format: String)
  case class MediaFeatures(doc_id: Long, format: String, byte_len: Int,
                           width: Int, height: Int, n_frames: Int,
                           feature_checksum: Long)

  /** Deterministic stand-in for a real media codec. */
  object StubCodec {
    def decode(r: MediaRow): MediaFeatures = {
      val len = r.content.length
      // ??? real codec goes here; the fake is a pure function of bytes
      val checksum = r.content.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xffffffffL)
      MediaFeatures(r.doc_id, r.format, len,
        len % 640 + 16, len % 480 + 16, len % 30 + 1, checksum)
    }
  }

  /** Text→binary media view of documents (the testdata has no real
    * media payloads; the binary column IS the contract). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      when(octet_length(encode(col("text"), "UTF-8")) % 3 === 0, "jpeg")
        .when(octet_length(encode(col("text"), "UTF-8")) % 3 === 1, "png")
        .otherwise("webp").as("format"))

  /** Batch decode via mapPartitions: one codec context per partition,
    * rows streamed through it — the right shape for expensive
    * per-batch initialization (model load, codec init) at scale. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition codec init would happen here
      rows.map(StubCodec.decode)
    }
  }

  /** Oracle-checkable metadata query: byte length + the deterministic
    * fake decode geometry, expressed as pure column arithmetic so the
    * DuckDB oracle can replay it. Mirrors StubCodec's geometry. */
  def mediaMeta(docs: DataFrame): DataFrame =
    metaFrame(docs).orderBy(col("doc_id"))

  /** [[mediaMeta]] without the presentation sort (shared with
    * [[sampleFrames]], which sorts its own exploded output). */
  private def metaFrame(docs: DataFrame): DataFrame =
    asMedia(docs)
      .select(
        col("doc_id"),
        col("format"),
        octet_length(col("content")).as("byte_len"))
      .withColumn("width", col("byte_len") % 640 + 16)
      .withColumn("height", col("byte_len") % 480 + 16)
      .withColumn("n_frames", col("byte_len") % 30 + 1)

  /** Frame sampling plan: fan each media row out into its sampled
    * frame rows — every `stride`-th frame index, at most `maxFrames`
    * per doc — the video→frames step that feeds per-frame decode /
    * embedding at scale. Row-local explode with output bounded by
    * maxFrames per doc, so the fan-out never amplifies a long video
    * unboundedly; the frame DECODE stays behind the
    * [[decodeFeatures]] codec seam, but the sampling plan (which
    * frames exist, in which order) is pure column arithmetic and
    * oracle-checked. */
  def sampleFrames(docs: DataFrame, stride: Int = 5,
                   maxFrames: Int = 4): DataFrame = {
    require(stride > 0 && maxFrames > 0)
    metaFrame(docs)
      .select(col("doc_id"), col("format"), col("n_frames"),
        explode(slice(
          sequence(lit(0), col("n_frames") - 1, lit(stride)),
          1, maxFrames)).as("frame_ix"))
      .orderBy(col("doc_id"), col("frame_ix"))
  }
}
