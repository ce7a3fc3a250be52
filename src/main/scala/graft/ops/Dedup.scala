package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication operators.
  *
  * The reference implements first-wins dedup four ways (SURVEY §2.3):
  * Flink keyed state with TTL (TopKStreamingJob.kt:87-119), an
  * event-time-timer variant (ProcessFunctions.kt:21-57), an in-memory
  * hashmap sweep (KafkaConsumerTopKJob.kt:163-169), and Pinot's
  * declarative `dedupConfig` (orders_raw_upsert_table.json:4-7).
  * Batch semantics collapse to "keep exactly one row per key"; we make
  * the survivor deterministic (first by an explicit ordering) so the
  * result is oracle-comparable.
  *
  * Scale notes: `firstWins` is a single hash-shuffle on the dedup key
  * followed by a per-partition sort — the same exchange Flink's
  * `keyBy(event_id)` performs. No global sort, no driver collect.
  * At 100 TB the key-space partitions cleanly; skew on a hot key is
  * impossible for true PK dedup (each key is unique ±dupes).
  */
object Dedup {

  /** Keep the first row per key under `order` (deterministic
    * first-wins — Flink DeduplicationFunction semantics where "first"
    * is arrival order; here explicit event-time order).
    */
  def firstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest-wins upsert dedup — Pinot's *upsert* table mode on the
    * timestamp comparison column (orders_raw_upsert_table.json is
    * upsertConfig FULL on `timestamp` in addition to dedupConfig;
    * pinot/README.md §1): the row with the greatest `tsCol` per key
    * survives, ties broken by `tiebreak` asc for determinism. Same
    * single key-shuffle plan as [[firstWins]] with the time order
    * inverted.
    */
  def lastWins(df: DataFrame, keys: Seq[String], tsCol: String,
      tiebreak: Seq[Column]): DataFrame =
    firstWins(df, keys, col(tsCol).desc +: tiebreak)

  /** Nondeterministic-survivor exact dedup (Pinot dedupConfig
    * equivalent) — cheaper than firstWins when any survivor will do:
    * partial (map-side) dedup runs before the shuffle.
    */
  def anyWins(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** PARTIAL upsert — Pinot's partial-upsert table mode (per-column
    * merge strategy OVERWRITE-if-present): each incoming row is a
    * sparse PATCH carrying values for some columns and NULL for the
    * rest; the merged row per key holds, for every column, the value
    * from the LATEST patch where that column was non-null. Unlike
    * [[lastWins]] (whole-row survivor), different columns of the
    * merged row can come from different source rows.
    *
    * `patches` maps output column name → patch expression (NULL =
    * "this row does not set the column"); `ord` must totally order a
    * key's rows (ties among rows identical on every patch expression
    * are harmless). Plan: ONE key-shuffle with partial aggregation —
    * `max_by(c, ord-if-set)` buffers merge map-side, so at 100 TB the
    * exchange carries one sparse row per (partition, key), not the
    * patch history; no window, no self-join.
    */
  def partialUpsert(df: DataFrame, key: String, ord: Column,
      patches: Seq[(String, Column)]): DataFrame = {
    val aggs = patches.map { case (name, c) =>
      max_by(c, when(c.isNotNull, ord)).as(name)
    }
    df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** The shared events→profile-patch projection every partial-upsert
    * surface uses (batch gate, streaming ingest twin, served profile
    * state): purchase rows set the spend field, click rows the click
    * time, every row the event type. `ord` is a zero-padded
    * (epoch_us, cents, type) string — identical lexicographic
    * comparison in any engine, and rows tying on all of it carry
    * identical patch values, so ties are interchangeable. (No
    * event_id in the key: the serving layer's synthetic refresh
    * frames carry only ts/user/type/cents.)
    */
  def profilePatches(events: DataFrame): DataFrame = events.select(
    col("user_id"),
    concat(
      lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
      // lpad TRUNCATES beyond 12 chars and a '-' prefix breaks
      // lexicographic order, so the total-order contract only holds
      // on 0 <= value_cents < 1e12 — enforced, not assumed: an
      // out-of-domain row fails loudly instead of silently misordering
      when(col("value_cents") < 0L ||
          col("value_cents") >= 1000000000000L,
        raise_error(concat(
          lit("profilePatches ord requires 0 <= value_cents < 1e12, got "),
          col("value_cents").cast("string"))))
        .otherwise(lpad(col("value_cents").cast("string"), 12, "0")),
      col("event_type")).as("ord"),
    col("event_type").as("typ"),
    when(col("event_type") === "purchase", col("value_cents"))
      .as("purchase_cents"),
    when(col("event_type") === "click", unix_millis(col("ts")))
      .as("click_ms"))
}
