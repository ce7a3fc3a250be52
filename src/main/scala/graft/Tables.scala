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

  /** Event stream table. The parquet stores INT64 TIMESTAMP(NANOS)
    * which Spark 4 rejects by default — read nanos as long
    * (legacy conf) and floor-convert to microsecond TimestampType.
    * The generated data IS sub-microsecond (ns remainders in ~all
    * rows), so the engine's time precision contract is µs: any oracle
    * that compares or orders on raw ts must do so at epoch_us grain
    * (see EventQueries q_dedup_events / q_recent_24h), not at DuckDB's
    * native ns. Also derives `value_cents` the same way the reference
    * derives `revenue_cents` at ingest
    * (orders_raw_upsert_table.json:53-59).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withColumn("value_cents", cents(col("value")))
  }

  /** events with a time floor applied to the RAW nanosecond column
    * BEFORE the µs derivation — a filter on the derived timestamp
    * cannot push through the projection, but `raw_ns >= minTsMs·10⁶`
    * is an attribute-vs-literal predicate the parquet scan prunes
    * row groups with (exactly ⟺ derived µs ts ≥ minTsMs, since the
    * boundary is a whole millisecond).
    */
  def eventsFrom(spark: SparkSession, dir: String, minTsMs: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .filter(col("ts") >= lit(minTsMs * 1000000L))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withColumn("value_cents", cents(col("value")))
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
