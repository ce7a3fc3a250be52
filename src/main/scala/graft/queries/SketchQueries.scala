package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{CmSketch, KmvSketch, TupleSketch}
import graft.serving.Serving

/** Deterministic-sketch query surface — the set-expression and
  * frequency-estimation capabilities beyond the HLL family
  * (`OlapQueries.distinctIntersectHll`): KMV/theta distinct sketches
  * with union/intersect/DIFFERENCE estimates, and a count-min
  * frequency sketch expressed relationally. Each sketch has two
  * paths sharing one oracle: query-time (one pass over raw events)
  * and SERVED (probing the materialized sketch state under the
  * serving root — [[graft.serving.Serving]]'s `cm_daily` /
  * `kmv_daily` tables, refreshed incrementally by the streaming
  * pipeline). Both produce identical numbers because the state
  * merges are exact (additive counts; mergeable KMV top-k).
  *
  * Unlike the HLL gates (engine-specific sketch → `est_ok` tolerance
  * bit), everything here is md5-derived integer arithmetic both
  * engines reproduce exactly, so the gates hash-check the ESTIMATES
  * themselves — the approximation is part of the checked contract,
  * not a tolerance band. Accuracy (estimates near exact) is asserted
  * in SketchSpec; the gates also carry the exact values side by side
  * for inspection.
  */
object SketchQueries {

  type QFn = (SparkSession, String) => DataFrame

  private val K = KmvSketch.DefaultK

  /** Set-op estimate columns from a one-row (sk_a, sk_b) frame: the
    * theta-composition algebra shared by the query-time and served
    * KMV entries. Sketches are coalesced to empty so a wholly-absent
    * set yields 0-estimates (matching the oracle's empty CTEs)
    * instead of NULL-propagating.
    */
  private def kmvSetEstimates(pivoted: DataFrame): DataFrame = {
    val emptySk = array().cast("array<bigint>")
    pivoted
      .withColumn("sk_a", coalesce(col("sk_a"), emptySk))
      .withColumn("sk_b", coalesce(col("sk_b"), emptySk))
      .withColumn("theta",
        least(KmvSketch.theta(col("sk_a"), K), KmvSketch.theta(col("sk_b"), K)))
      .withColumn("sa", KmvSketch.sample(col("sk_a"), col("theta")))
      .withColumn("sb", KmvSketch.sample(col("sk_b"), col("theta")))
      .select(
        KmvSketch.estimate(col("sk_a"), K).as("est_a"),
        KmvSketch.estimate(col("sk_b"), K).as("est_b"),
        KmvSketch.scaleUp(size(array_intersect(col("sa"), col("sb"))), col("theta"))
          .as("est_inter"),
        KmvSketch.scaleUp(size(array_except(col("sa"), col("sb"))), col("theta"))
          .as("est_diff"),
        KmvSketch.scaleUp(size(array_union(col("sa"), col("sb"))), col("theta"))
          .as("est_union"))
  }

  /** Pivot per-type sketch rows to one (sk_a=click, sk_b=purchase) row. */
  private def pivotClickPurchase(sk: DataFrame): DataFrame =
    sk.agg(
      first(when(col("event_type") === "click", col("sk")), ignoreNulls = true)
        .as("sk_a"),
      first(when(col("event_type") === "purchase", col("sk")), ignoreNulls = true)
        .as("sk_b"))

  /** Pivot tagged sketch rows (s ∈ {a, b}, sk) to one (sk_a, sk_b)
    * row — for set pairs that are not event types (e.g. day cohorts).
    */
  private def pivotTag(sk: DataFrame): DataFrame =
    sk.agg(
      first(when(col("s") === "a", col("sk")), ignoreNulls = true).as("sk_a"),
      first(when(col("s") === "b", col("sk")), ignoreNulls = true).as("sk_b"))

  /** The gate's ground-truth half: exact distinct-set ops from raw
    * events — the expensive joins the sketches exist to avoid.
    */
  private def kmvExactSetOps(ev: DataFrame): DataFrame =
    kmvExactSetOpsAB(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))

  /** Exact set ops over two arbitrary user-id frames. */
  private def kmvExactSetOpsAB(a0: DataFrame, b0: DataFrame): DataFrame = {
    val a = a0.select("user_id").distinct()
    val b = b0.select("user_id").distinct()
    a.agg(count(lit(1)).as("exact_a"))
      .crossJoin(b.agg(count(lit(1)).as("exact_b")))
      .crossJoin(a.join(b, Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("exact_inter")))
      .crossJoin(a.join(b, Seq("user_id"), "left_anti")
        .agg(count(lit(1)).as("exact_diff")))
      .crossJoin(a.union(b).distinct().agg(count(lit(1)).as("exact_union")))
  }

  /** KMV theta-sketch set operations over click/purchase user sets:
    * per-set distinct estimates plus intersection, DIFFERENCE
    * (click-only users — the query HLL cannot answer), and union
    * estimates from the composed-θ samples, with the exact values
    * alongside. One row.
    *
    * Scale shape: the sketch build is one pass with bounded (k-long)
    * partial state per group merged associatively — the same
    * partial/final agg plan as any SUM; the set-op composition runs
    * on two one-row sketches. At 100 TB the exact columns are the
    * expensive distinct-joins and exist only as the gate's
    * ground-truth half; the sketch half never shuffles more than
    * k longs per group.
    */
  def distinctKmv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sk = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), KmvSketch.keyHash(col("user_id")).as("h"))
      .groupBy(col("event_type"))
      .agg(KmvSketch.kmv(col("h"), K).as("sk"))
    kmvExactSetOps(ev).crossJoin(kmvSetEstimates(pivotClickPurchase(sk)))
  }

  /** Merge stored day-grain sketches (optionally day-filtered) back
    * into one sketch per type — EXACT: k smallest distinct over the
    * union equals a direct build over the same days' raw rows.
    */
  private def mergedDailyKmv(spark: SparkSession, dir: String,
      fromMs: Option[Long]): DataFrame = {
    val daily = Serving.readTable(spark, dir, "kmv_daily")
      .filter(col("event_type").isin("click", "purchase"))
    fromMs.fold(daily)(c => daily.filter(col("window_start_ms") >= c))
      .select(col("event_type"), explode(col("sk")).as("h"))
      .groupBy(col("event_type"))
      .agg(KmvSketch.kmv(col("h"), K).as("sk"))
  }

  /** The same set-op estimates SERVED from the materialized day-grain
    * sketch state (`kmv_daily` under the serving root) — no raw scan
    * on the sketch half at all. The day re-merge is bit-identical to
    * a direct build (exact KMV merge), so this shares
    * [[distinctKmv]]'s oracle; the exact columns remain the gate's
    * raw-recompute ground truth.
    */
  def distinctKmvServed(spark: SparkSession, dir: String): DataFrame =
    kmvExactSetOps(Tables.events(spark, dir))
      .crossJoin(kmvSetEstimates(pivotClickPurchase(
        mergedDailyKmv(spark, dir, None))))

  /** TIME-WINDOWED set-op estimates from the day-grain KMV state —
    * what the per-day sketch column exists for (a Pinot rollup
    * table's DISTINCTCOUNTTHETASKETCH at query-time re-merge): the
    * last-4-calendar-day sketches re-merge into exactly the sketch a
    * direct pass over that window would build, so "distinct
    * clickers-not-purchasers this week" never rescans history. The
    * exact half recomputes over the same day-aligned window.
    */
  def distinctKmvWindow(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = Serving.anchorMs(spark, dir) / dayMs * dayMs - 3 * dayMs
    val ev = Tables.events(spark, dir)
      .filter(unix_millis(col("ts")) >= cutoff)
    kmvExactSetOps(ev)
      .crossJoin(kmvSetEstimates(pivotClickPurchase(
        mergedDailyKmv(spark, dir, Some(cutoff)))))
  }

  /** CROSS-DAY retention set-ops from the day-grain KMV state — the
    * theta-sketch capability a per-time-bucket sketch column exists
    * for (Pinot's canonical DISTINCTCOUNTTHETASKETCH example: users
    * in segment/day A ∘ day B): the first and last data days' user
    * sketches (each the exact union-merge of that day's per-type
    * sketches — a day's global k-minimum hashes always survive their
    * type sketches) compose into returning/churned/either-day
    * estimates without any raw-history scan. The exact half
    * recomputes both day cohorts from raw — the gate's ground truth.
    */
  def distinctKmvRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val days = ev.agg(
      min(expr(s"unix_millis(ts) div $dayMs")).as("a"),
      max(expr(s"unix_millis(ts) div $dayMs")).as("b")).head()
    val (dayA, dayB) = (days.getLong(0) * dayMs, days.getLong(1) * dayMs)
    // separate tagged legs (not a when-tag over one scan) so the
    // degenerate single-day corpus (dayA == dayB) still yields BOTH
    // cohorts, matching the oracle's tagged union
    val daily = Serving.readTable(spark, dir, "kmv_daily")
    def leg(ms: Long, tag: String) = daily
      .filter(col("window_start_ms") === ms)
      .select(lit(tag).as("s"), explode(col("sk")).as("h"))
    val sk = leg(dayA, "a").unionAll(leg(dayB, "b"))
      .groupBy(col("s"))
      .agg(KmvSketch.kmv(col("h"), K).as("sk"))
    def dayOf(ms: Long) =
      ev.filter(expr(s"unix_millis(ts) div $dayMs") === ms / dayMs)
    kmvExactSetOpsAB(dayOf(dayA), dayOf(dayB))
      .crossJoin(kmvSetEstimates(pivotTag(sk)))
  }

  /** TUPLE sketch set-op metrics — the theta sketch upgraded with an
    * exact integer summary per retained key ([[TupleSketch]]): total
    * purchase revenue, and purchase revenue FROM USERS WHO ALSO
    * CLICKED — a metric over a set intersection, which two separate
    * aggregates cannot answer and the raw path needs a user-level
    * join for. The estimates are sample-sum scale-ups through the
    * same composed-θ algebra as [[distinctKmv]], all md5-derived
    * integer arithmetic, so the gate hash-checks them; the exact
    * columns (distinct-join recompute) ride alongside as ground
    * truth.
    *
    * Scale shape: identical to the KMV half — bounded 2k-long state
    * per group, associative merges, one pass; the set-metric
    * composition runs on two one-row sketches. The exact half is the
    * expensive user-grain join the sketch replaces at 100 TB.
    */
  def distinctTuple(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sk = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        KmvSketch.keyHash(col("user_id")).as("h"),
        col("value_cents").as("v"))
      .groupBy(col("event_type"))
      .agg(TupleSketch.tupleSk(col("h"), col("v"), K).as("sk"))
    tupleExactHalf(ev).crossJoin(tupleEstimates(pivotClickPurchase(sk)))
  }

  /** The same set-metric estimates SERVED from the materialized
    * day-grain tuple state (`tuple_daily` under the serving root):
    * stored (hash, sum) pairs explode, equal hashes sum across days,
    * and the k-min re-sketch is bit-identical to a direct build
    * ([[graft.serving.Serving.dailyTupleSketches]]'s exactness
    * argument), so this shares [[distinctTuple]]'s oracle. The exact
    * columns remain the raw-recompute ground truth.
    */
  def distinctTupleServed(spark: SparkSession, dir: String): DataFrame = {
    val merged = Serving.readTable(spark, dir, "tuple_daily")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        explode(arrays_zip(col("sk.hs"), col("sk.vs"))).as("e"))
      .select(col("event_type"), col("e.hs").as("h"), col("e.vs").as("v"))
      .groupBy(col("event_type"))
      .agg(TupleSketch.tupleSk(col("h"), col("v"), K).as("sk"))
    tupleExactHalf(Tables.events(spark, dir))
      .crossJoin(tupleEstimates(pivotClickPurchase(merged)))
  }

  /** TIME-WINDOWED set-metric estimates from the day-grain tuple
    * state — the metric twin of [[distinctKmvWindow]]: "purchase
    * revenue this week from users who also clicked this week"
    * re-merges only the last-4-calendar-day tuple sketches (day-
    * aligned cutoff, so the state merge ≡ a direct build over the
    * window); the exact half recomputes over the same window as
    * ground truth.
    */
  def distinctTupleWindow(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = Serving.anchorMs(spark, dir) / dayMs * dayMs - 3 * dayMs
    val merged = Serving.readTable(spark, dir, "tuple_daily")
      .filter(col("event_type").isin("click", "purchase") &&
        col("window_start_ms") >= cutoff)
      .select(col("event_type"),
        explode(arrays_zip(col("sk.hs"), col("sk.vs"))).as("e"))
      .select(col("event_type"), col("e.hs").as("h"), col("e.vs").as("v"))
      .groupBy(col("event_type"))
      .agg(TupleSketch.tupleSk(col("h"), col("v"), K).as("sk"))
    tupleExactHalf(
      Tables.events(spark, dir).filter(unix_millis(col("ts")) >= cutoff))
      .crossJoin(tupleEstimates(pivotClickPurchase(merged)))
  }

  /** CROSS-DAY returning-user revenue from the day-grain tuple state —
    * the question tuple sketches exist for in product analytics:
    * "how much did LAST-day purchasers who were ALSO active on the
    * FIRST day spend?" — a metric over a cross-day cohort
    * intersection, classically a user-grain self-join over raw
    * history. Day A's sketch union-merges all event types (active =
    * any event); day B's keeps only purchases with their cents sums;
    * the intersection metric composes through the same θ algebra.
    * The exact half recomputes both cohorts from raw — ground truth.
    */
  def distinctTupleRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val days = ev.agg(
      min(expr(s"unix_millis(ts) div $dayMs")).as("a"),
      max(expr(s"unix_millis(ts) div $dayMs")).as("b")).head()
    val (dayA, dayB) = (days.getLong(0) * dayMs, days.getLong(1) * dayMs)
    val daily = Serving.readTable(spark, dir, "tuple_daily")
    // separate tagged legs so a single-day corpus still yields both
    // cohorts (see distinctKmvRetention)
    def leg(frame: DataFrame, tag: String) = frame
      .select(lit(tag).as("s"),
        explode(arrays_zip(col("sk.hs"), col("sk.vs"))).as("e"))
      .select(col("s"), col("e.hs").as("h"), col("e.vs").as("v"))
    val sk = leg(daily.filter(col("window_start_ms") === dayA), "a")
      .unionAll(leg(daily.filter(col("window_start_ms") === dayB &&
        col("event_type") === "purchase"), "b"))
      .groupBy(col("s"))
      .agg(TupleSketch.tupleSk(col("h"), col("v"), K).as("sk"))
    def dayOf(ms: Long) =
      ev.filter(expr(s"unix_millis(ts) div $dayMs") === ms / dayMs)
    tupleExactHalfAB(dayOf(dayA),
        dayOf(dayB).filter(col("event_type") === "purchase"))
      .crossJoin(tupleEstimates(pivotTag(sk)))
  }

  /** Estimate columns from a one-row (sk_a, sk_b) tuple-sketch frame
    * (absent sets coalesced to empty — 0-estimates, not NULLs).
    */
  private def tupleEstimates(pivoted: DataFrame): DataFrame =
    pivoted
      .withColumn("sk_a", coalesce(col("sk_a"), TupleSketch.emptySk))
      .withColumn("sk_b", coalesce(col("sk_b"), TupleSketch.emptySk))
      .withColumn("th_b", KmvSketch.theta(col("sk_b.hs"), K))
      .withColumn("theta",
        least(KmvSketch.theta(col("sk_a.hs"), K), col("th_b")))
      .withColumn("ha", KmvSketch.sample(col("sk_a.hs"), col("theta")))
      .select(
        KmvSketch.estimate(col("sk_a.hs"), K).as("est_users_a"),
        KmvSketch.estimate(col("sk_b.hs"), K).as("est_users_b"),
        KmvSketch.scaleUp(
          TupleSketch.sumBelow(col("sk_b"), col("th_b")), col("th_b"))
          .as("est_rev_b"),
        KmvSketch.scaleUp(
          TupleSketch.sumBelowIn(col("sk_b"), col("theta"), col("ha")),
          col("theta"))
          .as("est_rev_inter"))

  /** Ground truth: the user-grain distinct/join recompute. */
  private def tupleExactHalf(ev: DataFrame): DataFrame =
    tupleExactHalfAB(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))

  /** Exact set-metric ground truth over two arbitrary event frames:
    * distinct users of each, B's total cents, and B's cents from
    * users also present in A.
    */
  private def tupleExactHalfAB(a0: DataFrame, b0: DataFrame): DataFrame = {
    val a = a0.select("user_id").distinct()
    val b = b0.groupBy(col("user_id")).agg(sum(col("value_cents")).as("v"))
    a.agg(count(lit(1)).as("exact_users_a"))
      .crossJoin(b.agg(
        count(lit(1)).as("exact_users_b"),
        coalesce(sum(col("v")), lit(0L)).as("exact_rev_b")))
      .crossJoin(b.join(a, Seq("user_id"), "left_semi")
        .agg(coalesce(sum(col("v")), lit(0L)).as("exact_rev_inter")))
  }

  /** The 20 lowest user_ids with exact counts, fanned out to their d
    * probe (i, bucket) coordinates — the probe side both CM paths
    * share (exact_cnt is the gate's ground-truth half).
    */
  private def cmProbes(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("user_id").asc).limit(20)
      .select(col("user_id"), col("exact_cnt"), CmSketch.rows)
      .withColumn("bucket", CmSketch.bucket(col("i"), col("user_id")))

  /** MIN over the d probed cells — the CM point estimate. */
  private def cmEstimate(sketch: DataFrame, probes: DataFrame): DataFrame =
    probes.join(sketch, Seq("i", "bucket"))
      .groupBy(col("user_id"), col("exact_cnt"))
      .agg(min(col("c")).as("est_cnt"))

  /** Count-min frequency sketch expressed relationally: the sketch IS
    * a d×w aggregated table (one row per (hash-row, bucket) with its
    * collision-summed count) — bounded at d·w rows no matter the
    * input size, mergeable by construction (it's a SUM group-by, so
    * Spark's partial/final agg is exactly the sketch merge). Point
    * estimates are a probe join + MIN over the d rows:
    * est(key) = min_i sketch[i][h_i(key)], the classic CM guarantee
    * est >= exact with bounded overestimate.
    *
    * Gate: the 20 lowest user_ids, exact count vs CM estimate — both
    * deterministic (seeded md5 row hashes), hash-checked.
    */
  def freqCm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sketch = ev.select(col("user_id"), CmSketch.rows)
      .withColumn("bucket", CmSketch.bucket(col("i"), col("user_id")))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    cmEstimate(sketch, cmProbes(ev))
  }

  /** The same frequency estimates SERVED from the materialized
    * day-grain CM state (`cm_daily` under the serving root): the
    * global sketch is SUM over the day rows per (i, bucket) — d·w
    * bounded rows read from state, no raw-event pass on the sketch
    * half. Additive counts make the day-rollup exactly equal a
    * one-pass build, so this shares [[freqCm]]'s oracle.
    */
  def freqCmServed(spark: SparkSession, dir: String): DataFrame = {
    val sketch = Serving.readTable(spark, dir, "cm_daily")
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("c")).as("c"))
    cmEstimate(sketch, cmProbes(Tables.events(spark, dir)))
  }

  private val dayMs = 86400000L

  /** TIME-WINDOWED frequency estimates from the day-grain CM state —
    * the reason the materialized sketch carries a day dimension at
    * all: summing only the last-4-calendar-day rows yields the exact
    * CM sketch of that window (counts are additive and the window is
    * day-aligned), so a "trending in the last N days" query reads ≤
    * N·d·w pruned state rows, never historical raw data. The cutoff
    * is day-floored from the data's max ts, so it is deterministic
    * and the state rows' day windows partition events exactly at it.
    */
  def freqCmWindow(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = Serving.anchorMs(spark, dir) / dayMs * dayMs - 3 * dayMs
    val sketch = Serving.readTable(spark, dir, "cm_daily")
      .filter(col("window_start_ms") >= cutoff)
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("c")).as("c"))
    val ev = Tables.events(spark, dir)
      .filter(unix_millis(col("ts")) >= cutoff)
    cmEstimate(sketch, cmProbes(ev))
  }

  /** Per-type + overall distinct users from per-(day, type) EXACT
    * bitmaps ([[graft.functions.BitmapDistinct]], Pinot's
    * DISTINCTCOUNTBITMAP analog): the day/type grains OR-merge back
    * to exactly the full-range bitmap, so unlike every other sketch
    * gate there is no estimate column at all — the merged counts ARE
    * `COUNT(DISTINCT …)` and hash-check against it directly. The
    * 'ALL' row re-merges ACROSS types too (set union of overlapping
    * user sets — the query a per-type COUNT(DISTINCT) table cannot
    * answer and HLL only approximates).
    *
    * Scale shape: one pass builds the grains with bounded-per-group
    * associative state (partial-agg tree == single pass, bit-exact);
    * the re-merge reads grain states, never raw history.
    */
  def distinctBitmap(spark: SparkSession, dir: String): DataFrame =
    bitmapRollup(Serving.dailyBitmaps(Tables.events(spark, dir)))

  /** The same counts SERVED from the materialized `bitmap_daily`
    * state under the serving root — no raw scan at all. OR-merge
    * exactness (refresh == rebuild bit-for-bit) is what lets this
    * share [[distinctBitmap]]'s COUNT(DISTINCT) oracle.
    */
  def distinctBitmapServed(spark: SparkSession, dir: String): DataFrame =
    bitmapRollup(Serving.readTable(spark, dir, "bitmap_daily")
      .select(col("window_start_ms"), col("event_type"), col("bm")))

  /** TIME-WINDOWED exact distinct users from the day-grain bitmap
    * state: the last-4-calendar-day bitmaps OR-merge into exactly
    * the window's bitmap (day-aligned cutoff), so "distinct users
    * this week, exactly" reads ≤ N·types pruned state rows and never
    * rescans history — the exact upgrade of [[distinctKmvWindow]].
    */
  def distinctBitmapWindow(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = Serving.anchorMs(spark, dir) / dayMs * dayMs - 3 * dayMs
    bitmapRollup(Serving.readTable(spark, dir, "bitmap_daily")
      .filter(col("window_start_ms") >= cutoff)
      .select(col("window_start_ms"), col("event_type"), col("bm")))
  }

  /** Shared re-merge: (window_start_ms, event_type, bm) grain rows →
    * one exact-count row per type plus the cross-type 'ALL' row.
    */
  private def bitmapRollup(grains: DataFrame): DataFrame = {
    import graft.functions.BitmapDistinct
    val perType = grains
      .groupBy(col("event_type"))
      .agg(BitmapDistinct.bitmapMerge(col("bm")).as("bm"))
    perType
      .unionAll(perType.select(lit("ALL").as("event_type"), col("bm"))
        .groupBy(col("event_type"))
        .agg(BitmapDistinct.bitmapMerge(col("bm")).as("bm")))
      .select(col("event_type"), BitmapDistinct.cardinality(col("bm")).as("n_users"))
  }

  val queries: Map[String, QFn] = Map(
    "q_distinct_bitmap" -> (distinctBitmap _),
    "q_distinct_bitmap_served" -> (distinctBitmapServed _),
    "q_distinct_bitmap_window" -> (distinctBitmapWindow _),
    "q_distinct_kmv" -> (distinctKmv _),
    "q_distinct_kmv_served" -> (distinctKmvServed _),
    "q_distinct_kmv_window" -> (distinctKmvWindow _),
    "q_distinct_kmv_retention" -> (distinctKmvRetention _),
    "q_distinct_tuple" -> (distinctTuple _),
    "q_distinct_tuple_served" -> (distinctTupleServed _),
    "q_distinct_tuple_window" -> (distinctTupleWindow _),
    "q_distinct_tuple_retention" -> (distinctTupleRetention _),
    "q_freq_cm" -> (freqCm _),
    "q_freq_cm_served" -> (freqCmServed _),
    "q_freq_cm_window" -> (freqCmWindow _),
  )

  private val Mlit = "1152921504606846976::HUGEINT"

  /** The KMV set-op recompute over a parameterized source: `srcWhere`
    * scopes the rows (empty = whole table; the windowed gate passes
    * the day-aligned cutoff) — engine and oracle then sketch the same
    * row set.
    */
  private def kmvOracleFor(srcWhere: String) =
    s"""WITH src AS (SELECT user_id, event_type FROM events $srcWhere),
       |h AS (
       |  SELECT DISTINCT event_type,
       |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM src WHERE event_type IN ('click', 'purchase')),
       |r AS (
       |  SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS cnt
       |  FROM h),
       |sk AS (SELECT * FROM r WHERE rn <= $K),
       |th AS (
       |  SELECT event_type,
       |    CASE WHEN max(cnt) < $K THEN 1152921504606846976
       |         ELSE max(CASE WHEN rn = $K THEN h END) END AS th_own,
       |    max(cnt) AS cnt
       |  FROM sk GROUP BY event_type),
       |pe AS (
       |  SELECT event_type,
       |    CASE WHEN cnt < $K THEN CAST(cnt AS BIGINT)
       |         ELSE CAST(${K - 1}::HUGEINT * $Mlit // th_own AS BIGINT)
       |    END AS est
       |  FROM th),
       |t AS (SELECT min(th_own) AS theta FROM th),
       |sa AS (SELECT h FROM sk, t WHERE event_type = 'click' AND h < theta),
       |sb AS (SELECT h FROM sk, t WHERE event_type = 'purchase' AND h < theta),
       |ops AS (
       |  SELECT
       |    (SELECT count(*) FROM sa WHERE h IN (SELECT h FROM sb)) AS c_inter,
       |    (SELECT count(*) FROM sa WHERE h NOT IN (SELECT h FROM sb)) AS c_diff,
       |    (SELECT count(*) FROM (SELECT h FROM sa UNION SELECT h FROM sb)) AS c_union),
       |est AS (
       |  SELECT
       |    (SELECT est FROM pe WHERE event_type = 'click') AS est_a,
       |    (SELECT est FROM pe WHERE event_type = 'purchase') AS est_b,
       |    CAST(c_inter::HUGEINT * $Mlit // (SELECT theta FROM t) AS BIGINT) AS est_inter,
       |    CAST(c_diff::HUGEINT * $Mlit // (SELECT theta FROM t) AS BIGINT) AS est_diff,
       |    CAST(c_union::HUGEINT * $Mlit // (SELECT theta FROM t) AS BIGINT) AS est_union
       |  FROM ops),
       |a AS (SELECT DISTINCT user_id FROM src WHERE event_type = 'click'),
       |b AS (SELECT DISTINCT user_id FROM src WHERE event_type = 'purchase'),
       |ex AS (
       |  SELECT
       |    (SELECT count(*) FROM a) AS exact_a,
       |    (SELECT count(*) FROM b) AS exact_b,
       |    (SELECT count(*) FROM a WHERE user_id IN (SELECT user_id FROM b)) AS exact_inter,
       |    (SELECT count(*) FROM a WHERE user_id NOT IN (SELECT user_id FROM b)) AS exact_diff,
       |    (SELECT count(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS exact_union)
       |SELECT ex.*, est.* FROM ex, est""".stripMargin

  private val cmOracle =
    s"""WITH d AS (SELECT unnest(range(0, ${CmSketch.Depth})) AS i),
       |s AS (
       |  SELECT i,
       |    ('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % ${CmSketch.Width} AS bucket
       |  FROM events, d),
       |sk AS (SELECT i, bucket, count(*) AS c FROM s GROUP BY 1, 2),
       |probes AS (
       |  SELECT user_id, count(*) AS exact_cnt FROM events
       |  GROUP BY 1 ORDER BY user_id LIMIT 20),
       |ph AS (
       |  SELECT user_id, exact_cnt, i,
       |    ('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % ${CmSketch.Width} AS bucket
       |  FROM probes, d)
       |SELECT ph.user_id, ph.exact_cnt, CAST(min(sk.c) AS BIGINT) AS est_cnt
       |FROM ph JOIN sk USING (i, bucket)
       |GROUP BY 1, 2""".stripMargin

  // the same sketch+probe recompute over the day-aligned window: the
  // cutoff is day-floored, so `ts >= cutoff` selects exactly the rows
  // the engine's windowed day-state sum covers
  private val cmWindowOracle =
    s"""WITH cut AS (
       |  SELECT (epoch_ms(max(ts)) // $dayMs) * $dayMs - 3*$dayMs AS c
       |  FROM events),
       |f AS (SELECT user_id FROM events WHERE epoch_ms(ts) >= (SELECT c FROM cut)),
       |d AS (SELECT unnest(range(0, ${CmSketch.Depth})) AS i),
       |s AS (
       |  SELECT i,
       |    ('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % ${CmSketch.Width} AS bucket
       |  FROM f, d),
       |sk AS (SELECT i, bucket, count(*) AS c FROM s GROUP BY 1, 2),
       |probes AS (
       |  SELECT user_id, count(*) AS exact_cnt FROM f
       |  GROUP BY 1 ORDER BY user_id LIMIT 20),
       |ph AS (
       |  SELECT user_id, exact_cnt, i,
       |    ('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % ${CmSketch.Width} AS bucket
       |  FROM probes, d)
       |SELECT ph.user_id, ph.exact_cnt, CAST(min(sk.c) AS BIGINT) AS est_cnt
       |FROM ph JOIN sk USING (i, bucket)
       |GROUP BY 1, 2""".stripMargin

  // shared with SqlQueries' pure-SQL sketch surface
  private[queries] val kmvOracle = kmvOracleFor("")

  private val kmvWindowOracle = kmvOracleFor(
    s"""WHERE epoch_ms(ts) >=
       |  (SELECT (epoch_ms(max(ts)) // $dayMs) * $dayMs - 3*$dayMs FROM events)"""
      .stripMargin)

  /** The same theta algebra over two ARBITRARY tagged user sets (the
    * engine's pivotTag twin) — for set pairs that are not event
    * types. Mirrors kmvOracleFor structure with `s` in place of
    * event_type.
    */
  private def kmvSetOracle(defA: String, defB: String) =
    s"""WITH src AS (
       |  SELECT 'a' AS s, user_id FROM events WHERE $defA
       |  UNION ALL
       |  SELECT 'b' AS s, user_id FROM events WHERE $defB),
       |h AS (
       |  SELECT DISTINCT s,
       |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM src),
       |r AS (
       |  SELECT s, h,
       |    row_number() OVER (PARTITION BY s ORDER BY h) AS rn,
       |    count(*) OVER (PARTITION BY s) AS cnt
       |  FROM h),
       |sk AS (SELECT * FROM r WHERE rn <= $K),
       |th AS (
       |  SELECT s,
       |    CASE WHEN max(cnt) < $K THEN 1152921504606846976
       |         ELSE max(CASE WHEN rn = $K THEN h END) END AS th_own,
       |    max(cnt) AS cnt
       |  FROM sk GROUP BY s),
       |pe AS (
       |  SELECT s,
       |    CASE WHEN cnt < $K THEN CAST(cnt AS BIGINT)
       |         ELSE CAST(${K - 1}::HUGEINT * $Mlit // th_own AS BIGINT)
       |    END AS est
       |  FROM th),
       |t AS (SELECT min(th_own) AS theta FROM th),
       |sa AS (SELECT h FROM sk, t WHERE s = 'a' AND h < theta),
       |sb AS (SELECT h FROM sk, t WHERE s = 'b' AND h < theta),
       |ops AS (
       |  SELECT
       |    (SELECT count(*) FROM sa WHERE h IN (SELECT h FROM sb)) AS c_inter,
       |    (SELECT count(*) FROM sa WHERE h NOT IN (SELECT h FROM sb)) AS c_diff,
       |    (SELECT count(*) FROM (SELECT h FROM sa UNION SELECT h FROM sb)) AS c_union),
       |est AS (
       |  SELECT
       |    (SELECT est FROM pe WHERE s = 'a') AS est_a,
       |    (SELECT est FROM pe WHERE s = 'b') AS est_b,
       |    CAST(c_inter::HUGEINT * $Mlit // (SELECT theta FROM t) AS BIGINT) AS est_inter,
       |    CAST(c_diff::HUGEINT * $Mlit // (SELECT theta FROM t) AS BIGINT) AS est_diff,
       |    CAST(c_union::HUGEINT * $Mlit // (SELECT theta FROM t) AS BIGINT) AS est_union
       |  FROM ops),
       |a AS (SELECT DISTINCT user_id FROM src WHERE s = 'a'),
       |b AS (SELECT DISTINCT user_id FROM src WHERE s = 'b'),
       |ex AS (
       |  SELECT
       |    (SELECT count(*) FROM a) AS exact_a,
       |    (SELECT count(*) FROM b) AS exact_b,
       |    (SELECT count(*) FROM a WHERE user_id IN (SELECT user_id FROM b)) AS exact_inter,
       |    (SELECT count(*) FROM a WHERE user_id NOT IN (SELECT user_id FROM b)) AS exact_diff,
       |    (SELECT count(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS exact_union)
       |SELECT ex.*, est.* FROM ex, est""".stripMargin

  /** Tuple-sketch mirror over two ARBITRARY tagged event sets (the
    * engine's pivotTag/pivotClickPurchase twin): the KMV chain with a
    * collision-merged per-hash cents sum carried through, estimates =
    * sample-sum scale-ups under the own/composed thresholds. `defA` /
    * `defB` are WHERE predicates selecting each side's rows.
    */
  private def tupleSetOracle(defA: String, defB: String) =
    s"""WITH src AS (
       |  SELECT 'a' AS s, user_id, CAST(round(value*100) AS BIGINT) AS c
       |  FROM events WHERE $defA
       |  UNION ALL
       |  SELECT 'b' AS s, user_id, CAST(round(value*100) AS BIGINT) AS c
       |  FROM events WHERE $defB),
       |uv AS (
       |  SELECT s,
       |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h,
       |    CAST(sum(c) AS BIGINT) AS v
       |  FROM src GROUP BY 1, 2),
       |r AS (
       |  SELECT s, h, v,
       |    row_number() OVER (PARTITION BY s ORDER BY h) AS rn,
       |    count(*) OVER (PARTITION BY s) AS cnt
       |  FROM uv),
       |sk AS (SELECT * FROM r WHERE rn <= $K),
       |th AS (
       |  SELECT s,
       |    CASE WHEN max(cnt) < $K THEN 1152921504606846976
       |         ELSE max(CASE WHEN rn = $K THEN h END) END AS th_own,
       |    max(cnt) AS cnt
       |  FROM sk GROUP BY 1),
       |pe AS (
       |  SELECT s,
       |    CASE WHEN cnt < $K THEN CAST(cnt AS BIGINT)
       |         ELSE CAST(${K - 1}::HUGEINT * $Mlit // th_own AS BIGINT)
       |    END AS est
       |  FROM th),
       |tb AS (
       |  SELECT COALESCE((SELECT th_own FROM th WHERE s = 'b'),
       |                  1152921504606846976) AS th_b),
       |t AS (
       |  SELECT COALESCE((SELECT min(th_own) FROM th),
       |                  1152921504606846976) AS theta),
       |sa AS (SELECT h FROM sk, t WHERE s = 'a' AND h < theta),
       |est AS (
       |  SELECT
       |    COALESCE((SELECT est FROM pe WHERE s = 'a'), 0) AS est_users_a,
       |    COALESCE((SELECT est FROM pe WHERE s = 'b'), 0) AS est_users_b,
       |    CAST((SELECT COALESCE(sum(v), 0) FROM sk, tb
       |          WHERE s = 'b' AND h < th_b)::HUGEINT
       |         * $Mlit // (SELECT th_b FROM tb) AS BIGINT) AS est_rev_b,
       |    CAST((SELECT COALESCE(sum(v), 0) FROM sk, t
       |          WHERE s = 'b' AND h < theta
       |            AND h IN (SELECT h FROM sa))::HUGEINT
       |         * $Mlit // (SELECT theta FROM t) AS BIGINT) AS est_rev_inter),
       |a AS (SELECT DISTINCT user_id FROM src WHERE s = 'a'),
       |bu AS (
       |  SELECT user_id, CAST(sum(c) AS BIGINT) AS v
       |  FROM src WHERE s = 'b' GROUP BY 1),
       |ex AS (
       |  SELECT
       |    (SELECT count(*) FROM a) AS exact_users_a,
       |    (SELECT count(*) FROM bu) AS exact_users_b,
       |    (SELECT CAST(COALESCE(sum(v), 0) AS BIGINT) FROM bu) AS exact_rev_b,
       |    (SELECT CAST(COALESCE(sum(v), 0) AS BIGINT) FROM bu
       |     WHERE user_id IN (SELECT user_id FROM a)) AS exact_rev_inter)
       |SELECT ex.*, est.* FROM ex, est""".stripMargin

  private[queries] val tupleOracle =
    tupleSetOracle("event_type = 'click'", "event_type = 'purchase'")

  private val tupleWindowCut =
    s"epoch_ms(ts) >= (SELECT (epoch_ms(max(ts)) // $dayMs) * $dayMs - 3*$dayMs FROM events)"

  private val tupleWindowOracle = tupleSetOracle(
    s"event_type = 'click' AND $tupleWindowCut",
    s"event_type = 'purchase' AND $tupleWindowCut")

  private val tupleRetentionOracle = tupleSetOracle(
    s"(epoch_ms(ts) // $dayMs) = (SELECT min(epoch_ms(ts) // $dayMs) FROM events)",
    s"event_type = 'purchase' AND (epoch_ms(ts) // $dayMs) = (SELECT max(epoch_ms(ts) // $dayMs) FROM events)")

  private val kmvRetentionOracle = kmvSetOracle(
    s"(epoch_ms(ts) // $dayMs) = (SELECT min(epoch_ms(ts) // $dayMs) FROM events)",
    s"(epoch_ms(ts) // $dayMs) = (SELECT max(epoch_ms(ts) // $dayMs) FROM events)")

  // the served twins share the direct paths' oracles: materialized
  // state merges are exact, so served estimates == direct estimates
  /** Exact distinct per type + overall, optionally row-scoped — the
    * bitmap gates' entire oracle: no sketch reproduction, just
    * COUNT(DISTINCT).
    */
  private def bitmapOracleFor(where: String) =
    s"""SELECT event_type, count(DISTINCT user_id) AS n_users
       |FROM events $where GROUP BY 1
       |UNION ALL
       |SELECT 'ALL' AS event_type, count(DISTINCT user_id) AS n_users
       |FROM events $where""".stripMargin

  private[queries] val bitmapOracle = bitmapOracleFor("")

  private val bitmapWindowOracle = bitmapOracleFor(
    s"""WHERE epoch_ms(ts) >=
       |  (SELECT (epoch_ms(max(ts)) // $dayMs) * $dayMs - 3*$dayMs FROM events)"""
      .stripMargin)

  val oracles: Map[String, String] = Map(
    "q_distinct_bitmap" -> bitmapOracle,
    "q_distinct_bitmap_served" -> bitmapOracle,
    "q_distinct_bitmap_window" -> bitmapWindowOracle,
    "q_distinct_kmv" -> kmvOracle,
    "q_distinct_kmv_served" -> kmvOracle,
    "q_distinct_kmv_window" -> kmvWindowOracle,
    "q_distinct_kmv_retention" -> kmvRetentionOracle,
    "q_distinct_tuple" -> tupleOracle,
    "q_distinct_tuple_served" -> tupleOracle,
    "q_distinct_tuple_window" -> tupleWindowOracle,
    "q_distinct_tuple_retention" -> tupleRetentionOracle,
    "q_freq_cm" -> cmOracle,
    "q_freq_cm_served" -> cmOracle,
    "q_freq_cm_window" -> cmWindowOracle,
  )
}
