package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Media

/** Multimodal plumbing queries: binary payload columns + stubbed
  * decode (see [[graft.multimodal.Media]]). The stub's arithmetic is
  * SQL-expressible, so the whole binary → mapPartitions → features
  * path has an exact DuckDB oracle.
  */
object MediaQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** events → binary media table → batch feature extraction. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Media.extractFeatures(spark,
      Media.mediaFromEvents(Tables.events(spark, dir))).toDF()

  /** Frame sampling fan-out: per-video frame counts + byte totals
    * (aggregated so the output is compact and integer-only).
    */
  def frameStats(spark: SparkSession, dir: String): DataFrame =
    Media.sampleFrames(spark,
        Media.mediaFromEvents(Tables.events(spark, dir)))
      .toDF()
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes")).cast("long")).as("sampled_bytes"))

  /** Resize stage, validated through the feature extractor: images
    * halve (ceil) in bytes with the header byte preserved; non-images
    * pass through untouched.
    */
  def resizeFeatures(spark: SparkSession, dir: String): DataFrame =
    Media.extractFeatures(spark,
      Media.resizeImages(spark,
        Media.mediaFromEvents(Tables.events(spark, dir))).toDF()).toDF()

  /** Content-hash dedup of binary payloads: identical bytes collapse
    * to one canonical media id — the image/audio dedup step of a
    * multimodal ingest (hash computed executor-side on the binary
    * column; payload bytes never shuffle, only the 128-bit hash does).
    */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    Media.mediaFromEvents(Tables.events(spark, dir))
      .groupBy(md5(col("bytes")).as("content_hash"))
      .agg(min(col("media_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** Cross-video FRAME overlap — duplicated-clip detection: sampled
    * frames whose exact bytes appear in ≥2 distinct videos, with
    * occurrence counts and the lowest owning id. The multimodal
    * analog of the dup-n-gram census: content reuse is found at the
    * sub-asset grain, where whole-file hashing ([[mediaDedup]]) is
    * blind. Frames hash executor-side (md5 before the aggregation),
    * so only 128-bit keys + ids cross the exchange — payload bytes
    * never shuffle; distinct-video counts dedup map-side.
    */
  def frameOverlap(spark: SparkSession, dir: String): DataFrame =
    Media.sampleFrames(spark,
        Media.mediaFromEvents(Tables.events(spark, dir)))
      .toDF()
      .select(md5(col("frame_bytes")).as("frame_hash"), col("media_id"))
      .groupBy(col("frame_hash"))
      .agg(countDistinct(col("media_id")).as("n_videos"),
        count(lit(1)).as("n_occurrences"),
        min(col("media_id")).as("first_media_id"))
      .filter(col("n_videos") >= 2L)

  /** Content-hash media dedup built through the STREAMING ingest leg
    * ([[graft.streaming.MediaIngest]]): id-ordered event thirds land
    * as per-batch (hash, min-id, count) deltas, the read is the
    * (min, sum) re-merge — order-independent mergeable state, so the
    * gate shares `q_media_dedup`'s oracle verbatim. The family's
    * first streaming leg; payload bytes never persist or shuffle.
    */
  def mediaDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.MediaIngest
    val ev = Tables.events(spark, dir)
    val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_media_ingest").toString
    Seq(
      ev.filter(col("event_id") <= cuts(0)),
      ev.filter(col("event_id") > cuts(0) && col("event_id") <= cuts(1)),
      ev.filter(col("event_id") > cuts(1))
    ).zipWithIndex.foreach { case (b, i) =>
      MediaIngest.processBatch(Media.mediaFromEvents(b), i.toLong,
        s"$tmp/state")
    }
    MediaIngest.readDedup(spark, s"$tmp/state")
  }

  // payload = props' UTF-8 bytes, so DuckDB's md5 over the VARCHAR
  // hashes the identical byte string.
  private val mediaDedupOracle =
    """SELECT md5(props) AS content_hash,
      |  CAST(min(event_id) AS BIGINT) AS canonical_id,
      |  count(*) AS n_copies
      |FROM events GROUP BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q_media_dedup_stream" -> (mediaDedupStream _),
    "q_media_frame_overlap" -> (frameOverlap _),
    "q_media_dedup" -> (mediaDedup _),
    "q_media_features" -> (mediaFeatures _),
    "q_media_frame_stats" -> (frameStats _),
    "q_media_resize" -> (resizeFeatures _),
  )

  val oracles: Map[String, String] = Map(
    // same kept-chunk rule as q_media_frame_stats (offsets 16·g, 8
    // bytes, substring truncates at end-of-payload exactly like the
    // Spark slice); props are ASCII so md5(VARCHAR) = md5(bytes)
    "q_media_frame_overlap" ->
      """WITH fr AS (
        |  SELECT event_id AS media_id,
        |    unnest(list_transform(range(0, (strlen(props) + 15) // 16),
        |      g -> md5(substring(props, CAST(16*g + 1 AS INTEGER), 8)))) AS frame_hash
        |  FROM events WHERE event_type = 'purchase' AND strlen(props) > 0)
        |SELECT frame_hash,
        |  count(DISTINCT media_id) AS n_videos,
        |  count(*) AS n_occurrences,
        |  CAST(min(media_id) AS BIGINT) AS first_media_id
        |FROM fr GROUP BY 1
        |HAVING count(DISTINCT media_id) >= 2""".stripMargin,
    // payload = props' UTF-8 bytes, so DuckDB's md5 over the VARCHAR
    // hashes the identical byte string.
    "q_media_dedup" -> mediaDedupOracle,
    // mergeable (min, sum) state: the stream-built dedup table equals
    // the batch op over everything ingested, any split or order
    "q_media_dedup_stream" -> mediaDedupOracle,
    "q_media_features" ->
      """SELECT event_id AS media_id,
        |  CASE WHEN event_type IN ('click','view') THEN 'image'
        |       WHEN event_type = 'purchase' THEN 'video'
        |       ELSE 'audio' END AS kind,
        |  CAST(strlen(props) AS BIGINT) AS n_bytes,
        |  CAST(ascii(props) AS BIGINT) AS header_byte,
        |  CAST(strlen(props) % 64 AS BIGINT) AS fake_width,
        |  CAST(ascii(props) % 64 AS BIGINT) AS fake_height,
        |  CAST(strlen(props) * 31 + ascii(props) AS BIGINT) AS checksum
        |FROM events""".stripMargin,
    // frameSize=8, stride=2: kept chunks start at byte offset 16*g,
    // so n_frames = ceil(L/16) and each kept chunk has
    // min(8, L - 16*g) bytes. A zero-length payload yields no frames,
    // so it produces no row on the Spark side (flatMap emits nothing
    // to aggregate) — mirror that with strlen > 0 here. Props are
    // ASCII JSON, so strlen (chars) == payload bytes.
    "q_media_frame_stats" ->
      """SELECT event_id AS media_id,
        |  CAST((strlen(props) + 15) // 16 AS BIGINT) AS n_frames,
        |  CAST(list_aggregate(list_transform(
        |      range(0, (strlen(props) + 15) // 16),
        |      g -> least(8, strlen(props) - 16*g)), 'sum') AS BIGINT) AS sampled_bytes
        |FROM events WHERE event_type = 'purchase' AND strlen(props) > 0""".stripMargin,
    // resize factor 2: images keep every 2nd byte -> n = ceil(L/2),
    // header (byte 0) preserved; video/audio pass through unchanged.
    "q_media_resize" ->
      """SELECT event_id AS media_id,
        |  CASE WHEN event_type IN ('click','view') THEN 'image'
        |       WHEN event_type = 'purchase' THEN 'video'
        |       ELSE 'audio' END AS kind,
        |  CAST(CASE WHEN event_type IN ('click','view')
        |       THEN (strlen(props) + 1) // 2 ELSE strlen(props) END AS BIGINT) AS n_bytes,
        |  CAST(ascii(props) AS BIGINT) AS header_byte,
        |  CAST(CASE WHEN event_type IN ('click','view')
        |       THEN ((strlen(props) + 1) // 2) % 64 ELSE strlen(props) % 64 END AS BIGINT) AS fake_width,
        |  CAST(ascii(props) % 64 AS BIGINT) AS fake_height,
        |  CAST(CASE WHEN event_type IN ('click','view')
        |       THEN ((strlen(props) + 1) // 2) * 31 + ascii(props)
        |       ELSE strlen(props) * 31 + ascii(props) END AS BIGINT) AS checksum
        |FROM events""".stripMargin,
  )
}
