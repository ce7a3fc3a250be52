package graft.serving

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TopK
import graft.tables.TableManager

/** Materialized serving layer — the Spark analog of the reference's
  * Pinot tables (restaurant_topk / global_topk, QueryService.kt:43-129).
  *
  * Pinot answers its 10-100 ms lookups from precomputed, sorted,
  * indexed segments; recomputing the whole rollup→rank pipeline from
  * raw events per query (as the round-1 lookup entries did) is the
  * wrong architecture at any scale. This module materializes the
  * ranked tables ONCE per dataset via [[TableManager.writePartitioned]]
  * (date-partitioned, sorted by (window, rank) for row-group pruning,
  * bloom-filtered on user_id for point lookups), and the serving
  * queries just read them — a single pruned parquet scan.
  *
  * Two ranked layouts, mirroring the reference's two query paths:
  *  - `topk_by_count`   — per-window rank by order count
  *    (calculateTopKPerRestaurant ordering, KafkaConsumerTopKJob.kt:243-272);
  *  - `topk_by_revenue` — per-window rank by revenue
  *    (the revenue path, QueryService.kt:99-129).
  * Plus `meta`: one row carrying max event ts, the anchor for the
  * API's now-relative defaults on static data.
  *
  * Freshness: the cache key fingerprints the source parquet (path,
  * bytes, mtime), so a regenerated dataset materializes fresh tables
  * instead of serving stale ones. In production this refresh is the
  * streaming pipeline's `foreachBatch` sink; here it is lazy-on-first
  * -query, which doubles as the Bench cold/warm split.
  */
object Serving {

  /** Ranks materialized per window — serves any query k <= K. */
  val K = 10

  val hourMs: Long = 3600L * 1000L

  /** Hourly per-user aggregate — the grain the global tables share. */
  def hourlyUserAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("total_cents"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("user_id"), col("order_count"), col("total_cents"))

  /** Hourly per-(restaurant, user) aggregate — the keyed tables'
    * grain (restaurant_topk analog; event_type plays restaurant_id).
    */
  def hourlyKeyedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"), col("user_id"))
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("total_cents"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("user_id"), col("order_count"), col("total_cents"))

  /** Serving root for a dataset, keyed by source-data fingerprint. */
  def servingRoot(spark: SparkSession, dataDir: String): String = {
    val src = new Path(s"$dataDir/events.parquet")
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fp =
      try {
        val sum = fs.getContentSummary(src)
        val mtime = fs.getFileStatus(src).getModificationTime
        s"$dataDir:${sum.getLength}:$mtime"
      } catch { case _: java.io.IOException => dataDir }
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(fp))
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_serving/$key"
  }

  /** Build the serving tables if absent; return the serving root. */
  def materialize(spark: SparkSession, dataDir: String): String = this.synchronized {
    val root = servingRoot(spark, dataDir)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables = Seq("topk_by_count", "topk_by_revenue",
      "topk_keyed_by_count", "topk_keyed_by_revenue", "meta")
    if (!tables.forall(t => fs.exists(new Path(s"$root/$t/_SUCCESS")))) {
      val ev = Tables.events(spark, dataDir)
      val agg = hourlyUserAgg(ev)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val keyed = hourlyKeyedAgg(ev)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        def write(ranked: DataFrame, table: String, sortCols: Seq[String]): Unit =
          TableManager.writePartitioned(
            ranked
              .withColumn("rank", col("rank").cast("long"))
              .withColumn("w_ts", timestamp_millis(col("window_start_ms"))),
            s"$root/$table",
            tsCol = "w_ts",
            sortCols = sortCols,
            bloomCol = Some("user_id"))
        val globalSort = Seq("window_start_ms", "rank")
        // keyed tables sort restaurant-first so a one-restaurant query
        // prunes row groups on the dominant predicate.
        val keyedSort = Seq("event_type", "window_start_ms", "rank")
        write(TopK.topKPerKey(agg, Seq("window_start_ms"),
          Seq(col("order_count").desc, col("total_cents").desc, col("user_id").asc), K),
          "topk_by_count", globalSort)
        write(TopK.topKPerKey(agg, Seq("window_start_ms"),
          Seq(col("total_cents").desc, col("order_count").desc, col("user_id").asc), K),
          "topk_by_revenue", globalSort)
        write(TopK.topKPerKey(keyed, Seq("window_start_ms", "event_type"),
          Seq(col("order_count").desc, col("total_cents").desc, col("user_id").asc), K),
          "topk_keyed_by_count", keyedSort)
        write(TopK.topKPerKey(keyed, Seq("window_start_ms", "event_type"),
          Seq(col("total_cents").desc, col("order_count").desc, col("user_id").asc), K),
          "topk_keyed_by_revenue", keyedSort)
        ev.agg(unix_millis(max(col("ts"))).as("max_ts_ms"))
          .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
      } finally { agg.unpersist(); keyed.unpersist() }
    }
    root
  }

  def readTable(spark: SparkSession, dataDir: String, table: String): DataFrame =
    spark.read.parquet(s"${materialize(spark, dataDir)}/$table")

  private val anchorCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** The now-anchor (max event ts, epoch ms). Read once per dataset
    * from the 1-row meta table and cached on the driver — a bounded
    * metadata fetch (like IVF centroids), NOT a data collect. Serving
    * queries inline it as a literal so the lookup is a single scan
    * with static row-group and partition-directory pruning, no
    * broadcast-join stage.
    */
  def anchorMs(spark: SparkSession, dataDir: String): Long = {
    val root = materialize(spark, dataDir)
    anchorCache.getOrElseUpdate(root,
      spark.read.parquet(s"$root/meta").head.getLong(0))
  }

  /** UTC date string of an epoch-ms instant — for partition pruning
    * predicates on the `p_date` layout column.
    */
  def utcDate(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)
      .toLocalDate.toString
}
