package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque binary columns
  * with typed metadata, and batch decode/feature-extract plumbing via
  * mapPartitions over a typed Dataset (the Scala analog of Python's
  * mapInPandas batches).
  *
  * The IMAGE leg is real: [[ImageCodec]] encodes deterministic PNGs
  * with `javax.imageio` (ships with the JDK) and decode reads real
  * width/height/band/pixel data back out of the compressed bytes —
  * the oracle's closed-form geometry is verified against an actual
  * PNG encode→decode round trip. Audio/video codecs are not in this
  * environment; they would plug in behind the same [[MediaRow]] seam
  * (binary content + format tag) with no plan-shape change, and the
  * video→frames SAMPLING plan is covered by [[sampleFrames]].
  */
object Multimodal {

  case class MediaRow(doc_id: Long, content: Array[Byte], format: String)
  case class MediaFeatures(doc_id: Long, format: String, width: Long,
                           height: Long, bands: Long, px_sum: Long)

  /** Real PNG codec over `javax.imageio`. Encode builds a grayscale
    * checkerboard whose geometry and pixel phase derive from doc_id:
    * width = doc_id%48+16, height = doc_id%32+16,
    * pixel(x,y) = ((x+y+doc_id)%2)·255. Every decoded feature is
    * therefore predictable in closed form — width/height/bands from
    * the geometry, px_sum = 255·(odd-parity cell count) — while the
    * decode itself does the real work: PNG inflate, filter reversal,
    * raster sample reads. The checkerboard alternation exercises PNG
    * row filters rather than compressing to a constant plane. */
  object ImageCodec {
    /** ImageIO defaults to DISK-backed stream caching: every
      * read/write through a raw Byte*Stream allocates a temp FILE per
      * image. On an executor decoding millions of in-memory payloads
      * that is one filesystem round-trip per row for zero benefit
      * (the payload is already fully in memory) — and its cost varies
      * with host dentry-cache state, which made the query's wall time
      * depend on what ran before it (measured 4× on the sf0.1 bench
      * mid-session). Called at each codec entry point, not only in a
      * class initializer, so the setting holds regardless of which
      * executor JVM touches the codec first. DELIBERATELY
      * process-global (javax.imageio has no per-stream switch short
      * of constructing ImageInputStreams by hand): any other ImageIO
      * user in this JVM also switches to memory-backed streams —
      * acceptable for an engine whose payloads are in-memory columns
      * by design, documented here in case one ever is not. */
    private def ensureMemoryCache(): Unit =
      if (ImageIO.getUseCache) ImageIO.setUseCache(false)

    def geometry(docId: Long): (Int, Int) =
      (((docId % 48) + 16).toInt, ((docId % 32) + 16).toInt)

    /** Closed-form expected pixel sum (mirrors the oracle SQL): the
      * count of cells with (x+y) odd in a w×h grid is ⌊wh/2⌋, and an
      * odd doc_id flips the phase to the complement. */
    def expectedPxSum(docId: Long): Long = {
      val (w, h) = geometry(docId)
      val cells = w.toLong * h
      255L * (if (docId % 2 == 0) cells / 2 else cells - cells / 2)
    }

    def encodePng(docId: Long): Array[Byte] = {
      ensureMemoryCache()
      val (w, h) = geometry(docId)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, (((x + y + docId) % 2) * 255).toInt)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      require(ImageIO.write(img, "png", out), "no PNG writer available")
      out.toByteArray
    }

    /** Decode real bytes. Fails loud on undecodable content — a
      * corrupt payload silently skipped would undercount a corpus. */
    def decode(r: MediaRow): MediaFeatures = {
      ensureMemoryCache()
      val img = ImageIO.read(new ByteArrayInputStream(r.content))
      require(img != null,
        s"doc ${r.doc_id}: undecodable ${r.format} payload")
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val bands = raster.getNumBands
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      MediaFeatures(r.doc_id, r.format, w.toLong, h.toLong, bands.toLong,
        sum)
    }
  }

  /** Synthetic image corpus: one real PNG per document, generated
    * partition-locally (no shuffle — the encode rides the scan). The
    * testdata ships no media payloads; this IS the binary-column
    * contract a real corpus would arrive with. */
  def syntheticImages(spark: SparkSession,
                      docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    // repartition the (8-byte) id frame before the codec: the docs
    // parquet at probe scale is one small file = 1-2 scan partitions,
    // which would serialize all encode+decode work onto 2 of 32
    // cores; a real media corpus arrives already distributed, and
    // this shuffle moves ids, not payloads
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { ids =>
        ids.map(id => MediaRow(id, ImageCodec.encodePng(id), "png"))
      }
  }

  /** Batch decode via mapPartitions: one codec context per partition,
    * rows streamed through it — the right shape for expensive
    * per-batch initialization (model load, codec init) at scale. */
  def decodeFeatures(spark: SparkSession,
                     media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(rows => rows.map(ImageCodec.decode))
  }

  /** Oracle-checked decode query: encode a real PNG per doc, decode
    * it back, emit the decoded geometry and pixel sum. The oracle
    * predicts every column in closed form from doc_id, so a hash
    * match proves the decode read exactly what the encode wrote. */
  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeFeatures(spark, syntheticImages(spark, docs))
      .toDF().orderBy(col("doc_id"))

  /** Text→binary media view of documents with synthetic format tags —
    * the metadata-only leg that feeds the frame-sampling plan (video
    * payloads don't exist in this environment; their frame COUNTS are
    * declared metadata derived from byte length). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      when(octet_length(encode(col("text"), "UTF-8")) % 3 === 0, "jpeg")
        .when(octet_length(encode(col("text"), "UTF-8")) % 3 === 1, "png")
        .otherwise("webp").as("format"))

  /** Declared media metadata for the sampling plan (byte_len-derived
    * synthetic frame counts — see [[asMedia]]). */
  private def metaFrame(docs: DataFrame): DataFrame =
    asMedia(docs)
      .select(
        col("doc_id"),
        col("format"),
        octet_length(col("content")).as("byte_len"))
      .withColumn("n_frames", col("byte_len") % 30 + 1)

  /** Frame sampling plan: fan each media row out into its sampled
    * frame rows — every `stride`-th frame index, at most `maxFrames`
    * per doc — the video→frames step that feeds per-frame decode /
    * embedding at scale. Row-local explode with output bounded by
    * maxFrames per doc, so the fan-out never amplifies a long video
    * unboundedly; the frame DECODE would sit behind the same
    * [[ImageCodec]]-style seam, but the sampling plan (which frames
    * exist, in which order) is pure column arithmetic and
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

  case class AudioFeatures(doc_id: Long, sample_rate: Long,
                           n_samples: Long, duration_us: Long,
                           peak_abs: Long, rms: Double)

  /** Real RIFF/PCM WAV codec — the audio leg of the multimodal
    * contract, no external libs needed (a WAV is 44 header bytes +
    * little-endian int16 PCM). Encode writes a mono square wave whose
    * amplitude a = (doc_id%100+1)·250, length n = (doc_id%400)+100
    * samples and rate (8 or 16 kHz by doc_id parity) all derive from
    * doc_id; decode PARSES the actual bytes (magic tags, fmt chunk,
    * PCM/mono/16-bit asserts, sample loop) and computes peak and RMS
    * from the samples. A square wave's RMS is its amplitude EXACTLY —
    * n·a² is below 2⁵³ so mean and sqrt are both exact IEEE — so the
    * oracle predicts every decoded column in closed form from doc_id
    * and a hash match proves the decode read precisely what the
    * encode wrote (the PNG-leg contract, for audio). */
  object WavCodec {
    def amplitude(docId: Long): Int = (((docId % 100) + 1) * 250).toInt
    def nSamples(docId: Long): Int = ((docId % 400) + 100).toInt
    def sampleRate(docId: Long): Int = if (docId % 2 == 0) 8000 else 16000
    private val HalfPeriod = 8

    def encodeWav(docId: Long): Array[Byte] = {
      val a = amplitude(docId)
      val n = nSamples(docId)
      val rate = sampleRate(docId)
      val dataSize = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      var i = 0
      while (i < n) {
        val sgn = if ((i / HalfPeriod) % 2 == 0) 1 else -1
        buf.putShort((sgn * a).toShort)
        i += 1
      }
      buf.array()
    }

    def decode(r: MediaRow): AudioFeatures = {
      val buf = java.nio.ByteBuffer.wrap(r.content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(tag() == "RIFF", s"doc ${r.doc_id}: not RIFF")
      buf.getInt()
      require(tag() == "WAVE", s"doc ${r.doc_id}: not WAVE")
      require(tag() == "fmt ", s"doc ${r.doc_id}: missing fmt chunk")
      require(buf.getInt() == 16, s"doc ${r.doc_id}: non-PCM fmt size")
      require(buf.getShort() == 1, s"doc ${r.doc_id}: not PCM")
      require(buf.getShort() == 1, s"doc ${r.doc_id}: not mono")
      val rate = buf.getInt()
      buf.getInt(); buf.getShort()
      require(buf.getShort() == 16, s"doc ${r.doc_id}: not 16-bit")
      require(tag() == "data", s"doc ${r.doc_id}: missing data chunk")
      val dataSize = buf.getInt()
      val n = dataSize / 2
      var peak = 0L
      var sumsq = 0L
      var i = 0
      while (i < n) {
        val s = buf.getShort().toLong
        val abs = math.abs(s)
        if (abs > peak) peak = abs
        sumsq += s * s
        i += 1
      }
      AudioFeatures(r.doc_id, rate.toLong, n.toLong,
        n.toLong * 1000000L / rate,
        peak, math.sqrt(sumsq.toDouble / n))
    }
  }

  /** Synthetic audio corpus: one real WAV per document, encoded
    * partition-locally after the same id-frame repartition as the
    * image leg (payloads never shuffle; a real corpus arrives
    * distributed). */
  def syntheticAudio(spark: SparkSession,
                     docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { ids =>
        ids.map(id => MediaRow(id, WavCodec.encodeWav(id), "wav"))
      }
  }

  /** Oracle-checked audio decode query: encode a real WAV per doc,
    * parse it back, emit rate/length/duration/peak/RMS. */
  def audioMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    syntheticAudio(spark, docs)
      .mapPartitions(rows => rows.map(WavCodec.decode))
      .toDF().orderBy(col("doc_id"))
  }
}
