package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders for the driver-generated parquet test data
  * (see TESTDATA.md). All engine code reads through here so that
  * type normalization (timestamp unit, money-in-cents) happens in
  * exactly one place.
  *
  * Money convention: the reference keeps all money in integer cents
  * (reference README.md:15, DataGenerator.kt:24) — we derive
  * `value_cents`/`*_cents` columns with `round(x*100)::long` so all
  * downstream aggregation is exact integer arithmetic (no
  * floating-point drift vs the DuckDB oracle).
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Cheap content fingerprint of a table directory: ONE listStatus
    * RPC — (path, file count, total bytes, max mtime). Cache keys
    * derived from this stay fresh when a dataset is regenerated in
    * place, without paying a recursive getContentSummary walk on
    * every serving call.
    */
  def fingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val st = fs.listStatus(p)
      val mtime = if (st.isEmpty) 0L else st.map(_.getModificationTime).max
      s"$path:${st.length}:${st.map(_.getLen).sum}:$mtime"
    } catch { case _: java.io.IOException => path }
  }

  /** Dollars → integer cents. Exact for 2-decimal inputs. */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100).cast(LongType)

  /** Event stream table. The generator's `ts` physical type has
    * varied across testdata versions — INT64 TIMESTAMP(NANOS) (which
    * Spark 4 reads as long under the legacy conf; floor-convert to
    * µs) vs native timestamp[us] without timezone (which Spark reads
    * as TIMESTAMP_NTZ; reinterpret as an instant under the session's
    * UTC zone, matching how DuckDB's epoch_us reads the same file) —
    * so normalize BOTH to µs TimestampType here. The engine's time
    * precision contract stays µs: any oracle that compares or orders
    * on raw ts does so at epoch_us grain (see EventQueries
    * q_dedup_events / q_recent_24h). Also derives `value_cents` the
    * same way the reference derives `revenue_cents` at ingest
    * (orders_raw_upsert_table.json:53-59).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
      .withColumn("value_cents", cents(col("value")))
  }

  private def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }

  /** events with a time floor applied to the RAW stored column BEFORE
    * any derivation — a filter on a derived timestamp cannot push
    * through the projection, but attribute-vs-literal on the stored
    * representation (raw_ns ≥ minTsMs·10⁶, or the equivalent NTZ
    * literal) is a predicate the parquet scan prunes row groups with
    * (exactly ⟺ derived µs ts ≥ minTsMs, since the boundary is a
    * whole millisecond).
    */
  def eventsFrom(spark: SparkSession, dir: String, minTsMs: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    val pruned = raw.schema("ts").dataType match {
      case LongType => raw.filter(col("ts") >= lit(minTsMs * 1000000L))
      case TimestampNTZType => raw.filter(
        col("ts") >= timestamp_micros(lit(minTsMs * 1000L)).cast(TimestampNTZType))
      case _ => raw.filter(col("ts") >= timestamp_micros(lit(minTsMs * 1000L)))
    }
    normalizeTs(pruned).withColumn("value_cents", cents(col("value")))
  }

  def documents(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")

  def orders(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")

  def customer(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")

  def part(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part")

  def supplier(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "supplier")

  def nation(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "nation")

  def region(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "region")
}
