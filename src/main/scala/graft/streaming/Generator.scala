package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7: synthetic event generator + its self-checking tally — the
  * Spark analog of the reference's DataGenerator, whose running
  * top-10-by-revenue tally is the reference's de-facto end-to-end
  * test (DataGenerator.kt:52-53, 98-128).
  *
  * The generator is a rate source driving a monotone counter; every
  * event field is a pure function of the counter value, and every
  * `dupEvery`-th tick re-emits the previous event id with a
  * byte-identical payload (deliberate duplicate-order injection for
  * the dedup stage). Determinism is the point: the tally the
  * generator "would have kept" is exactly reconstructable afterwards
  * from the counter range alone ([[expectedTopUsers]]), so the
  * streaming pipeline's output can be checked against it with no
  * second source of truth.
  */
object Generator {

  val eventTypes: Seq[String] = Seq("click", "view", "purchase", "signup", "error")
  val numUsers = 50
  val dupEvery = 20

  /** Unbounded rate-source counter (the production shape). */
  def rateCounter(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()

  /** Map a (timestamp, value) counter frame to events. Works on the
    * streaming rate source and on `spark.range` alike — that shared
    * derivation is what makes the batch twin an oracle.
    */
  def eventsFromCounter(counter: DataFrame): DataFrame = {
    val dup = col("value") % dupEvery === 0 && col("value") > 0
    counter
      .select(col("timestamp").as("ts"),
        when(dup, col("value") - 1).otherwise(col("value")).as("event_id"))
      .withColumn("user_id", pmod(xxhash64(col("event_id")), lit(numUsers.toLong)))
      .withColumn("event_type", element_at(
        array(eventTypes.map(lit(_)): _*),
        (pmod(xxhash64(lit(1), col("event_id")), lit(eventTypes.size.toLong)) + 1).cast("int")))
      .withColumn("value",
        pmod(xxhash64(lit(2), col("event_id")), lit(10000L)).cast("double") / 100.0)
  }

  /** The generator's own tally, reconstructed in batch: the deduped
    * event set for counter values [0, upTo) and its top-k users by
    * (orders desc, revenue desc, id asc) — the oracle the streaming
    * pipeline's continuous top-K must equal.
    */
  def expectedTopUsers(spark: SparkSession, upTo: Long, k: Int): DataFrame = {
    val survivors = spark.range(0, upTo).toDF("value")
      .filter(!(col("value") % dupEvery === 0 && col("value") > 0))
      .withColumn("timestamp", lit(null).cast("timestamp"))
    eventsFromCounter(survivors)
      .withColumn("value_cents", round(col("value") * 100).cast("long"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("value_cents")).as("total_cents"))
      .orderBy(col("order_count").desc, col("total_cents").desc, col("user_id").asc)
      .limit(k)
  }

  /** Lift a deduped event stream into global-"ALL" continuous top-K
    * updates — the reference's ALL-sentinel twin stream
    * (ProcessFunctions.kt:117-132: global rows emitted alongside
    * per-restaurant rows under the "ALL" key).
    */
  def toGlobalUpdates(spark: SparkSession, deduped: DataFrame): org.apache.spark.sql.Dataset[ContinuousTopK.ItemUpdate] = {
    import spark.implicits._
    deduped.select(
      lit("ALL").as("groupKey"),
      col("user_id").cast("string").as("itemId"),
      lit(1L).as("count"),
      col("value_cents").as("valueCents"),
      col("ts")).as[ContinuousTopK.ItemUpdate]
  }
}
