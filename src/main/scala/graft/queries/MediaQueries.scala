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

  /** The media family's SIMILARITY tier, stacked on the exact tier:
    * payloads collapse to one canonical asset per distinct content
    * (min owning id — [[mediaDedup]]'s grouping), each canonical gets
    * a stub embedding ([[graft.multimodal.Media.embedStub]]; a real
    * deployment swaps in CLIP), and near-duplicate PAIRS come from
    * random-hyperplane LSH banding with exact-cosine verification
    * ([[graft.ops.Ann.rhpNearDupPairs]]) — duplicated-but-not-
    * identical assets that whole-file hashing is blind to.
    *
    * Scale shape: signatures (hash + 16-dim vector) are computed
    * payload-local in ONE pass; only they shuffle, the binary column
    * never does, and the LSH exchange is hash-only with vectors
    * fetched by id for candidates (the [[graft.ops.Ann]] invariant).
    * Threshold 0.8 sits mid-gap in the fixture's similarity
    * distribution (nearest pair sims 0.66 / 0.99), so the gate's
    * boundary decisions are rounding-safe in both engines.
    */
  def mediaNearDup(spark: SparkSession, dir: String): DataFrame = {
    val sig = Media.extractSignatures(spark,
      Media.mediaFromEvents(Tables.events(spark, dir))).toDF()
    val canon = sig.groupBy(col("content_hash"))
      .agg(min(col("media_id")).as("media_id"),
        // identical bytes → identical embedding; first() is stable
        first(col("embedding")).as("embedding"))
      .select(col("media_id"), col("embedding"))
    graft.ops.Ann.rhpNearDupPairs(canon, threshold = 0.8,
      idCol = "media_id", vecCol = "embedding")
  }

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

  /** The similarity tier built through the STREAMING ingest leg
    * ([[graft.streaming.MediaIngest.processSignatureBatch]]): id-
    * ordered event thirds land as per-batch (hash, min-id, embedding)
    * signature deltas — payloads never persist — and the read
    * collapses the state to the canonical asset set and runs the
    * SAME RHP-LSH + exact-cosine verify as the batch gate. Min-merge
    * state is order-independent, so this shares `q_media_neardup`'s
    * oracle verbatim: the streaming split must be invisible in the
    * pair set.
    */
  def mediaNearDupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.MediaIngest
    val ev = Tables.events(spark, dir)
    val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_media_sig_ingest").toString
    Seq(
      ev.filter(col("event_id") <= cuts(0)),
      ev.filter(col("event_id") > cuts(0) && col("event_id") <= cuts(1)),
      ev.filter(col("event_id") > cuts(1))
    ).zipWithIndex.foreach { case (b, i) =>
      MediaIngest.processSignatureBatch(Media.mediaFromEvents(b), i.toLong,
        s"$tmp/state")
    }
    MediaIngest.readNearDup(spark, s"$tmp/state")
  }

  // payload = props' UTF-8 bytes, so DuckDB's md5 over the VARCHAR
  // hashes the identical byte string.
  private val mediaDedupOracle =
    """SELECT md5(props) AS content_hash,
      |  CAST(min(event_id) AS BIGINT) AS canonical_id,
      |  count(*) AS n_copies
      |FROM events GROUP BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q_media_neardup" -> (mediaNearDup _),
    "q_media_neardup_stream" -> (mediaNearDupStream _),
    "q_media_dedup_stream" -> (mediaDedupStream _),
    "q_media_frame_overlap" -> (frameOverlap _),
    "q_media_dedup" -> (mediaDedup _),
    "q_media_features" -> (mediaFeatures _),
    "q_media_frame_stats" -> (frameStats _),
    "q_media_resize" -> (resizeFeatures _),
  )

  // full replay of the similarity tier: canonical payload per
  // distinct content (min owning id), the 16-dim byte-fold stub
  // embedding (dim d sums byte-64 over positions ≡ d mod 16; props
  // are ASCII so ascii(char) = byte), hyperplanes from the 64
  // lowest-id canonicals pairwise (bit = dot-vs-dot), 4 bands × 8
  // bits, band-collision candidates, exact cosine verify at 0.8
  private val mediaNearDupOracle =
      """WITH canon AS (
        |  SELECT CAST(min(event_id) AS BIGINT) AS media_id,
        |    list_transform(range(0, 16), d ->
        |      coalesce(list_sum(list_transform(range(1 + d, strlen(props) + 1, 16),
        |        i -> ascii(substring(props, CAST(i AS INTEGER), 1)) - 64.0)), 0.0)) AS v
        |  FROM events GROUP BY props
        |), pl AS (
        |  SELECT row_number() OVER (ORDER BY media_id) - 1 AS r, v
        |  FROM canon ORDER BY media_id LIMIT 64
        |), hp AS (
        |  SELECT CAST(a.r // 2 AS INT) AS i, a.v AS va, b.v AS vb
        |  FROM pl a JOIN pl b ON b.r = a.r + 1 WHERE a.r % 2 = 0
        |), sig AS (
        |  SELECT c.media_id, h.i,
        |    CASE WHEN list_dot_product(c.v, h.va)
        |          >= list_dot_product(c.v, h.vb)
        |      THEN 1 ELSE 0 END AS bit
        |  FROM canon c CROSS JOIN hp h
        |), band AS (
        |  SELECT media_id, i // 8 AS band,
        |         CAST(SUM(bit << (i % 8)) AS BIGINT) AS bv
        |  FROM sig GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        |  FROM band a JOIN band b
        |    ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id
        |)
        |SELECT c.id_a, c.id_b
        |FROM cand c
        |JOIN canon ea ON ea.media_id = c.id_a
        |JOIN canon eb ON eb.media_id = c.id_b
        |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.8""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_media_neardup" -> mediaNearDupOracle,
    // min-merge signature state is order-independent: the stream-
    // built similarity tier must produce the identical pair set
    "q_media_neardup_stream" -> mediaNearDupOracle,
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
