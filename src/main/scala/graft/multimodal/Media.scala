package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata, and per-record
  * decode / feature-extract / frame-sample run as partition-local
  * batch transforms (`Dataset.mapPartitions` — the Scala analog of
  * the Python `mapInPandas` batch-UDF shape: one iterator in, one
  * iterator out, no per-row driver involvement, partitioning
  * preserved).
  *
  * The actual media codecs are NOT in this environment, so
  * `decodeStub` is a deterministic fake (clearly marked); the real
  * product here is the Spark-side contract: schema, batch iteration,
  * partition preservation, and the fan-out shape for frame sampling.
  * At 100 TB: payloads never pass through the driver, each partition
  * decodes independently, and feature rows are much narrower than
  * payload rows (project early, drop bytes before any shuffle).
  */
object Media {

  /** One media payload: binary bytes + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte], source: String)

  /** Decoded per-record features (bytes dropped — narrow row). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      header_byte: Long, fake_width: Long, fake_height: Long, checksum: Long)

  /** One sampled "frame" of a video payload. */
  case class Frame(media_id: Long, frame_idx: Long, frame_bytes: Array[Byte])

  /** Synthesize a media table from the events table: payload = the
    * props JSON bytes, kind derived from event_type. Stands in for a
    * real (id, kind, binary, meta) ingest.
    */
  def mediaFromEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("media_id"),
      when(col("event_type").isin("click", "view"), "image")
        .when(col("event_type") === "purchase", "video")
        .otherwise("audio").as("kind"),
      encode(col("props"), "UTF-8").as("bytes"),
      col("event_type").as("source"))

  /** ==== STUB ==== deterministic fake decoder. A real deployment
    * replaces the body with an image/audio codec call; the signature
    * and batch shape are the contract. Width/height/checksum are
    * arithmetic on the payload so tests (and the SQL oracle) can
    * validate the plumbing end-to-end.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Long, Long) = {
    val n = bytes.length.toLong
    val header = if (bytes.nonEmpty) (bytes(0) & 0xffL) else 0L
    (n, header, n % 64, header % 64)
  }

  /** Partition-local batch decode: binary in, narrow features out. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        val (n, header, w, h) = decodeStub(rec.bytes)
        MediaFeatures(rec.media_id, rec.kind, n, header, w, h, n * 31 + header)
      }
    }
  }

  /** ==== STUB ==== deterministic fake resize: a real implementation
    * decodes, scales W×H, re-encodes; the stub keeps every `factor`-th
    * byte (so output length = ceil(L/factor), header byte preserved)
    * — arithmetic the SQL oracle can replicate.
    */
  def resizeStub(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Partition-local batch resize of image payloads: binary in,
    * binary out, 1:1, partitioning preserved — the downsample stage
    * of an image-training pipeline.
    */
  def resizeImages(spark: SparkSession, media: DataFrame, factor: Int = 2): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        if (rec.kind == "image") rec.copy(bytes = resizeStub(rec.bytes, factor))
        else rec
      }
    }
  }

  /** One media asset's content signature: 128-bit content hash (the
    * exact-dup key) + a small dense embedding (the similarity key) —
    * the NARROW row that shuffles in place of the payload.
    */
  case class MediaSignature(media_id: Long, content_hash: String,
      embedding: Array[Double])

  /** ==== STUB ==== deterministic 16-dim "embedding" of a payload:
    * dim d accumulates (byte − 64) over positions ≡ d (mod 16). A
    * real deployment replaces the body with a CLIP/audio encoder call
    * over the decoded media; the contract is the SHAPE — a dense
    * fixed-width vector computed payload-local, integer-exact so the
    * SQL oracle replays it bit-for-bit.
    */
  def embedStub(bytes: Array[Byte]): Array[Double] = {
    val v = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      v(i % 16) += (bytes(i) & 0xff) - 64
      i += 1
    }
    v
  }

  /** Row-local signature extraction: payload in, (hash, embedding)
    * out — both keys compute inside the scan stage (the codegen'd
    * `md5` built-in + the [[graft.functions.EmbedStub]] expression,
    * which matches [[embedStub]] bit-for-bit — MediaSpec pins the
    * parity), so the whole pass stays in WholeStageCodegen with no
    * encoder round-trip on the payload bytes, and the payload never
    * leaves the scan partition. At 100 TB this is the step that makes
    * media dedup shuffle-cheap: 40 bytes of hash + 128 bytes of
    * vector per asset cross the exchange, the binary column never
    * does.
    */
  def extractSignatures(spark: SparkSession, media: DataFrame): Dataset[MediaSignature] = {
    import spark.implicits._
    media.select(
      col("media_id"),
      md5(col("bytes")).as("content_hash"),
      graft.functions.MediaExprs.embed_stub(col("bytes")).as("embedding"))
      .as[MediaSignature]
  }

  /** Frame sampling for video payloads: split the byte payload into
    * fixed-size "frames", keep every `stride`-th — the fan-out shape
    * (flatMap, 1 row → n rows) of real video frame extraction.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameSize: Int = 8, stride: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRecord].flatMap { rec =>
      rec.bytes.grouped(frameSize).zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 => Frame(rec.media_id, i.toLong, chunk)
      }
    }
  }
}
