package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TopK

/** Join / scan / aggregation queries over the TPC-H-ish star schema —
  * the "extended engine" surface beyond the reference's single-table
  * pipeline (the reference has zero joins, SURVEY §2.7; a user moving
  * real workloads onto this engine needs them).
  *
  * Scale design, per query:
  *  - dimension tables (customer, part, nation, region, supplier)
  *    scale far slower than the facts — joined with explicit
  *    `broadcast()` hints so fact tables never shuffle for a dim join;
  *  - fact-fact joins (lineitem ⋈ orders) shuffle on the join key
  *    once, with AQE free to pick/skew-split at runtime;
  *  - money stays integer cents: per-row `round(expr*100)::long` is
  *    bit-deterministic (single IEEE multiply chain), then integer
  *    sums — exact at any scale and oracle-identical.
  */
object TpchQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  /** TPC-H Q1-flavor pricing summary: one scan of lineitem, group by
    * two low-cardinality flags.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))))
          .as("sum_charge_cents"),
        count(lit(1)).as("count_order"))

  /** Broadcast dim join: top-10 customers by total order value. */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("total_cents"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
    TopK.topKGlobal(agg, Seq(col("total_cents").desc, col("o_custkey").asc), 10)
      .select(col("rank").cast("long").as("rank"), col("o_custkey"),
        col("c_name"), col("total_cents"), col("n_orders"))
  }

  /** Multi-hop broadcast dims: revenue by region/nation of the
    * customer (region ⋈ nation ⋈ customer all broadcast; orders is
    * the only big side and never shuffles for the joins).
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    Tables.orders(spark, dir)
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(cents(col("o_totalprice"))).as("total_cents"),
        count(lit(1)).as("n_orders"))
  }

  /** Fact ⋈ fact shuffle join: discounted lineitem revenue joined to
    * orders, grouped by order priority and year.
    */
  def revenueByPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
        count(lit(1)).as("n_lines"))

  /** Broadcast part dim: top-10 brands by discounted revenue. */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
    TopK.topKGlobal(agg, Seq(col("revenue_cents").desc, col("p_brand").asc), 10)
      .select(col("rank").cast("long").as("rank"), col("p_brand"),
        col("revenue_cents"), col("sum_qty"))
  }

  /** Semi-join (EXISTS): customers with at least one urgent order in
    * 1996 — left_semi keeps the probe side unduplicated, no fact
    * columns shuffle.
    */
  def urgentCustomers(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Anti join: customers with NO urgent order — the left_anti
    * operator (complement of the semi-join family). Shuffled equi
    * anti-join on the key; the fact side never broadcasts.
    */
  def noUrgentCustomers(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    Tables.customer(spark, dir)
      .join(urgent, Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Bloom-pruned semi join ([[graft.ops.BloomJoin]]): revenue of
    * lineitems belonging to high-value orders. The build side
    * (orders > $450k) sketches into a bloom that prunes the lineitem
    * scan BEFORE the semi-join exchange; the exact semi join removes
    * the sketch's false positives, so the result hash-checks against
    * a plain IN-subquery oracle.
    */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val highValue = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 450000)
    graft.ops.BloomJoin
      .semiJoin(li, highValue, "l_orderkey", "o_orderkey",
        expectedItems = 100000L, fpp = 0.01)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(cents(col("l_extendedprice"))).as("revenue_cents"))
  }

  /** TPC-H Q3 shipping priority: BUILDING-segment customers' orders
    * placed before the cutoff, revenue from their lineitems shipped
    * after it, top-10 orders by revenue. Plan shape: the segment
    * filter shrinks customer to a broadcast dim that prunes orders
    * BEFORE the one fact-fact shuffle with lineitem; the top-10 is
    * the bounded-heap global top-K (TakeOrderedAndProject), never a
    * global sort.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-07-01"
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(cutoff))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val agg = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit(cutoff))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        // NTZ parquet timestamp -> epoch ms via the UTC session cast
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_orderpriority"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
    TopK.topKGlobal(agg,
        Seq(col("revenue_cents").desc, col("l_orderkey").asc), 10)
      .select(col("rank").cast("long").as("rank"), col("l_orderkey"),
        col("revenue_cents"), col("o_orderdate_ms"), col("o_orderpriority"))
  }

  /** TPC-H Q5 local-supplier volume: ASIA revenue by nation where the
    * SUPPLYING nation equals the ORDERING customer's nation — the
    * join-graph CYCLE shape (two independent dim paths constrained
    * equal), which exercises a constraint no star query has. All
    * dims broadcast; lineitem ⋈ orders is the only shuffle; the
    * nation-equality is a post-broadcast row-local filter, so the
    * cycle costs nothing extra at any scale.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q17 small-quantity revenue: lineitems of one brand whose
    * quantity is below 20% of the part's average quantity — the
    * SCALAR-CORRELATED-SUBQUERY shape done Spark-first: the per-part
    * average is one map-side-combining groupBy joined back by key
    * (never a per-row subquery), and the 0.2·avg comparison is the
    * exact integer cross-multiplication `5·qty·cnt < sum` (quantities
    * are integral), so no float average crosses the engine boundary.
    */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val brandItems = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_brand") === "Brand#13").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
    val avgQ = brandItems
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty_sum"),
        count(lit(1)).as("qty_cnt"))
    brandItems
      .join(broadcast(avgQ), Seq("l_partkey"))
      .filter(col("l_quantity").cast("long") * 5 * col("qty_cnt") < col("qty_sum"))
      .agg(
        sum(cents(col("l_extendedprice"))).as("total_cents"),
        count(lit(1)).as("n_lines"))
      .select(coalesce(col("total_cents"), lit(0L)).as("total_cents"),
        col("n_lines"))
  }

  /** TPC-H Q4 order-priority check, re-keyed to this schema: orders
    * with at least one LATE lineitem (shipped more than 30 days after
    * the order date), counted per priority — the EXISTS-with-
    * correlated-predicate shape. Spark-first plan: the existential is
    * a left_semi join whose condition carries both the key equality
    * AND the row-vs-row date predicate, so Catalyst plans one
    * shuffled semi join on l_orderkey (the non-equi date clause rides
    * along as the join filter) and the probe side deduplicates
    * matches for free — never a per-order subquery, never a
    * count-then-filter detour. lineitem is projected to two columns
    * before the exchange.
    */
  def lateOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    Tables.orders(spark, dir)
      .join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > expr("o_orderdate + INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
  }

  /** TPC-H Q14 promo-revenue share: the permille of one month's
    * discounted lineitem revenue that came from PROMO-type parts —
    * the conditional-aggregate RATIO shape. One broadcast dim join
    * (part projected to key+type), one scan with two conditional
    * sums, and the share is exact integer permille (1000·promo DIV
    * total) so no float division crosses the engine boundary.
    */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftShim.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    val agg = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-03-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L)))
          .as("promo_cents"),
        sum(rev).as("total_cents"))
    agg.select(col("promo_cents"), col("total_cents"),
      column(IntegralDivide(
        expression(col("promo_cents") * 1000L),
        expression(col("total_cents")))).as("promo_permille"))
  }

  /** TPC-H Q22 global-sales-opportunity shape: customers whose
    * account balance is above the population average but who placed
    * NO order since 1999 (lapsed big-balance accounts), per market
    * segment — the SCALAR-SUBQUERY + ANTI-JOIN composition. The
    * average is a one-row (sum, count) aggregate broadcast-crossed
    * into the scan, and the comparison is the exact
    * cross-multiplication `bal_cents·n > sum_cents` (no float
    * average; bal ≤ 10⁶ cents keeps the product inside BIGINT up to
    * n ≈ 9·10¹² customers). The recency clause is a shuffled
    * left_anti on the key over an orders side date-filtered (a
    * parquet-pruned predicate) and projected to one column before
    * the exchange.
    */
  def idleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .withColumn("bal_cents", cents(col("c_acctbal")))
    val avgRow = cust.agg(
      sum(col("bal_cents")).as("all_sum"), count(lit(1)).as("all_n"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01"))
      .select(col("o_custkey").as("c_custkey"))
    cust
      .crossJoin(broadcast(avgRow))
      .filter(col("bal_cents") * col("all_n") > col("all_sum"))
      .join(recent, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"), sum(col("bal_cents")).as("bal_sum_cents"))
  }

  /** TPC-H Q15 top supplier: each supplier's discounted revenue over
    * one quarter, keeping the supplier(s) whose revenue EQUALS the
    * global maximum — the AGGREGATE-OF-AGGREGATE (view + scalar max)
    * shape, with ties kept like the spec's correlated `= max`
    * subquery. Spark-first: one map-side-combining groupBy builds
    * the per-supplier view, its 1-row max broadcast-crosses back,
    * and the equality filter is row-local — never a window over the
    * whole view, never a second fact scan.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
    rev
      .crossJoin(broadcast(rev.agg(max(col("revenue_cents")).as("max_cents"))))
      .filter(col("revenue_cents") === col("max_cents"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey"), col("s_name"), col("revenue_cents"))
  }

  /** TPC-H Q13 customer distribution: how many customers placed
    * exactly k (non-urgent) orders, INCLUDING the zero-order bucket —
    * the OUTER-JOIN + count-of-count double aggregation shape.
    * Spark-first plan: orders pre-aggregate to per-customer counts
    * (map-side combine, one key shuffle) BEFORE the outer join, so
    * order rows never cross the join — the textbook
    * `customer LEFT JOIN orders … GROUP BY c_custkey` plan would
    * shuffle the whole fact through the join and re-shuffle it for
    * the count; this plan moves one bounded row per active customer.
    * The second aggregation's domain is tiny (distinct order counts),
    * so `custdist` is a near-free final shuffle.
    */
  def custDistribution(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("c"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(counts, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("c"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q18 large-volume customers: orders whose total lineitem
    * quantity exceeds 280, with their customer, top-10 by order value
    * — the HAVING-over-fact-aggregate + join-back shape. The quantity
    * sums aggregate map-side on l_orderkey and the >280 survivor set
    * is a tiny fraction (≈p99.5) of orders, so the join back to
    * orders is effectively a semi join that AQE can broadcast; the
    * top-10 is the bounded-heap TakeOrderedAndProject, never a sort.
    */
  def bigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 280L)
    val joined = Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("c_custkey"), col("c_name"),
        cents(col("o_totalprice")).as("total_cents"), col("sum_qty"))
    TopK.topKGlobal(joined,
        Seq(col("total_cents").desc, col("o_orderkey").asc), 10)
      .select(col("rank").cast("long").as("rank"), col("o_orderkey"),
        col("o_orderdate_ms"), col("c_custkey"), col("c_name"),
        col("total_cents"), col("sum_qty"))
  }

  /** TPC-H Q19 discounted revenue under a DISJUNCTION of brand/size/
    * quantity conjunctions — the OR-of-ANDs predicate shape that
    * defeats naive pushdown (the full predicate references BOTH join
    * sides, so it can only apply after the join). Scale plan: the
    * per-side NECESSARY conditions are factored out by hand —
    * Catalyst does not distribute a cross-side disjunction — so the
    * lineitem scan keeps only qty ∈ [1,30] rows and the part side
    * only the three brands BEFORE the broadcast join; the residual
    * disjunction is then row-local on the joined stream.
    */
  def disjunctRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity").between(1, 30)) // necessary for every disjunct
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    val p = Tables.part(spark, dir)
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(count(lit(1)).as("n_lines"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
      .select(col("n_lines"),
        coalesce(col("revenue_cents"), lit(0L)).as("revenue_cents"))
  }

  /** TPC-H Q21 suppliers-who-kept-orders-waiting, re-keyed to this
    * schema (no commit/receipt dates): for multi-supplier orders
    * where EXACTLY ONE supplier shipped late (>30 days after the
    * order date), charge that supplier a wait; top-10 suppliers by
    * wait count. The spec's EXISTS(other supplier) + NOT EXISTS
    * (other LATE supplier) pair is re-expressed as per-order counts —
    * `n_supps > 1 AND n_late = 1` with `min(case when late)` naming
    * the culprit — so the whole double-existential costs two
    * order-keyed aggregations (both map-side combining) instead of
    * two correlated self-joins of the fact. The oracle keeps the
    * textbook EXISTS/NOT-EXISTS formulation, making the gate a
    * cross-formulation equivalence check.
    */
  def soleLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") > expr("o_orderdate + INTERVAL 30 DAYS"),
        lit(1L)).otherwise(lit(0L))).as("late"))
    val waits = perSupp
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supps"), sum(col("late")).as("n_late"),
        min(when(col("late") === 1L, col("l_suppkey"))).as("l_suppkey"))
      .filter(col("n_supps") > 1 && col("n_late") === 1L)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
    TopK.topKGlobal(waits, Seq(col("numwait").desc, col("l_suppkey").asc), 10)
      .select(col("rank").cast("long").as("rank"), col("l_suppkey"),
        col("s_name"), col("numwait"))
  }

  /** TPC-H Q7 volume shipping, at region grain (nation keys in this
    * generator are SF-dependent; regions are stable): discounted
    * revenue flowing EUROPE→ASIA or ASIA→EUROPE (supplier region →
    * customer region), per direction per year — the BIDIRECTIONAL
    * trade-pair shape whose filter is a disjunction over the two
    * dim paths jointly. Both region dims resolve through broadcast
    * joins, the pair filter is row-local after them, and
    * lineitem ⋈ orders stays the only shuffle.
    */
  def tradeVolume(spark: SparkSession, dir: String): DataFrame = {
    val nationRegion = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("r_name"))
    val suppRegion = Tables.supplier(spark, dir)
      .join(broadcast(nationRegion), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("r_name").as("supp_region"))
    val custRegion = Tables.customer(spark, dir)
      .join(broadcast(nationRegion), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("r_name").as("cust_region"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppRegion), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_region") === "EUROPE" && col("cust_region") === "ASIA") ||
        (col("supp_region") === "ASIA" && col("cust_region") === "EUROPE"))
      .groupBy(col("supp_region"), col("cust_region"),
        year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q8 national market share, at region grain: of all lineitem
    * revenue sold to ASIA-region customers, the permille supplied
    * from EUROPE, per order year — the CONDITIONAL-SHARE-per-group
    * shape (Q14's ratio generalized to a grouped time series). Exact
    * integer permille per year; the supplier-region flag rides the
    * broadcast dim join so the fact scans once.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftShim.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val nationRegion = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("r_name"))
    val suppEurope = Tables.supplier(spark, dir)
      .join(broadcast(nationRegion), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), (col("r_name") === "EUROPE").as("from_europe"))
    val asiaCusts = Tables.customer(spark, dir)
      .join(broadcast(nationRegion), col("c_nationkey") === col("n_nationkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("c_custkey"))
    val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCusts), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppEurope), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(sum(when(col("from_europe"), rev).otherwise(lit(0L)))
        .as("europe_cents"),
        sum(rev).as("total_cents"))
      .select(col("order_year"), col("europe_cents"), col("total_cents"),
        column(IntegralDivide(
          expression(col("europe_cents") * 1000L),
          expression(col("total_cents")))).cast("long").as("share_permille"))
  }

  /** TPC-H Q10 returned-item reporting: top-20 customers by revenue
    * lost to returns (l_returnflag = 'R') in one order year. The
    * date filter prunes orders at the parquet scan, the returns
    * filter prunes lineitem, the per-customer loss aggregates
    * map-side after the one fact-fact shuffle, and customer resolves
    * by broadcast on the ≤|survivors| aggregate — the bounded-heap
    * top-20 never sorts.
    */
  def returnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("lost_cents"),
        count(lit(1)).as("n_items"))
      .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    TopK.topKGlobal(perCust, Seq(col("lost_cents").desc, col("o_custkey").asc), 20)
      .select(col("rank").cast("long").as("rank"), col("o_custkey"),
        col("c_name"), col("c_mktsegment"), col("lost_cents"), col("n_items"))
  }

  /** TPC-H Q2 minimum-cost supplier, re-keyed to this schema (no
    * partsupp): for every part of one brand, the supplier(s) whose
    * average realized unit price over that part's lineitems is the
    * minimum — the CORRELATED-MIN-PER-GROUP shape with ties kept
    * (Q15's `= max` view generalized from one global group to one
    * group per part). Unit price is integer micro-cents,
    * `1e6·Σprice DIV Σqty` — the floor is mirrored verbatim in the
    * oracle, so "minimum at micro-cent resolution" is exact on both
    * engines and no float division crosses the boundary. Plan: the
    * brand filter broadcasts part onto the scan, per-(part, supplier)
    * sums aggregate map-side, the per-part min runs over that
    * bounded aggregate, and the ties-kept equality join-back joins
    * aggregate-sized sides on (part, unit) — the fact scans once.
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftShim.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val perSupp = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_brand") === "Brand#13").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("sp_cents"),
        sum(col("l_quantity").cast("long")).as("sp_qty"))
      .withColumn("unit_micro",
        column(IntegralDivide(
          expression(col("sp_cents") * 1000000L),
          expression(col("sp_qty")))).cast("long"))
    val minPerPart = perSupp
      .groupBy(col("l_partkey"))
      .agg(min(col("unit_micro")).as("min_micro"))
    perSupp
      .join(minPerPart.withColumnRenamed("min_micro", "unit_micro"),
        Seq("l_partkey", "unit_micro"))
      .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("s_name"),
        col("unit_micro"), col("sp_cents"), col("sp_qty"))
  }

  /** TPC-H Q6 forecast revenue change: one lineitem scan under three
    * conjunctive range predicates (ship year, discount band, quantity
    * cap), summing `price·discount` — the pure predicate-pushdown
    * query: every filter reaches the parquet scan (`PushedFilters`)
    * and row-group min/max pruning does the rest; no join, no
    * shuffle beyond the 1-row aggregate. Revenue is exact integer
    * micro-cents (price_cents · discount_permille), so the
    * double-multiply chain never crosses the engine boundary.
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        sum(cents(col("l_extendedprice")) * round(col("l_discount") * 1000).cast("long"))
          .as("revenue_microcents"),
        count(lit(1)).as("n_lines"))
      .select(coalesce(col("revenue_microcents"), lit(0L)).as("revenue_microcents"),
        col("n_lines"))

  /** TPC-H Q9-shape product-type profit: per supplier nation × order
    * year, the margin earned on parts whose name matches a token
    * ("bolt") — margin = discounted revenue minus retail cost
    * (`p_retailprice · quantity`, the schema's cost stand-in for the
    * absent partsupp.ps_supplycost; reference TPC-H Q9 otherwise).
    * Scale shape: the name filter prunes part BEFORE its broadcast
    * (≤|part| rows, dims never shuffle the fact), supplier→nation
    * resolves as one small broadcast chain, and the only fact-fact
    * exchange is the single lineitem ⋈ orders shuffle on orderkey;
    * the (nation × year) aggregate collapses map-side onto a
    * 25×7-row domain. Margin stays exact integer cents: retail
    * cents · integer quantity, no float crosses the wire.
    */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_name").contains("bolt"))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_cents"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))) -
          col("retail_cents") * col("l_quantity").cast("long"))
          .as("profit_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** Hierarchical ROLLUP over the geography dimension: revenue at
    * (region, nation), region subtotal, and grand total in ONE pass —
    * the grouping-sets sibling of the events CUBE gate
    * (`q_cube_revenue`), on the star schema where the hierarchy is
    * real. Dims broadcast; the rollup expand is ×3 on the aggregate
    * KEYS only (Spark expands pre-aggregation rows, but partial
    * aggregation still collapses map-side onto the ≤3·|nations|
    * domain before the shuffle). Subtotal rows are marked by
    * grouping_id and sentinel-coalesced so the output is null-free.
    */
  def rollupGeoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    Tables.orders(spark, dir)
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("total_cents"),
        grouping_id().as("gid"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("r_name"),
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        col("gid"), col("n_orders"), col("total_cents"))
  }

  /** [[revenueByNation]] as a STREAM-STATIC enrichment — the one join
    * class the streaming twins hadn't driven: the orders FACT arrives
    * as a file-source stream (id-ordered thirds) and joins the static
    * customer→nation→region dimension by BROADCAST inside the
    * streaming plan (every micro-batch enriches against the pinned
    * dim — the Kafka-joins-a-dim-table shape every ingest pipeline
    * has). Per-batch (region, nation) partial sums land as idempotent
    * `batch_id` deltas (sums are additive, the DriftIngest pattern)
    * and the report re-sums at read — stream-final ≡ batch under any
    * split, so the gate shares `q_tpch_revenue_by_nation`'s oracle.
    */
  def revenueByNationStream(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val maxKey = orders.agg(max(col("o_orderkey"))).head().getLong(0)
    val cuts = Seq(maxKey / 3, 2 * maxKey / 3)
    val feed = OlapQueries.fileFeedDir(Seq(
      orders.filter(col("o_orderkey") <= cuts(0)),
      orders.filter(col("o_orderkey") > cuts(0) && col("o_orderkey") <= cuts(1)),
      orders.filter(col("o_orderkey") > cuts(1))))
    val dims = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    // the broadcast dim join sits IN the streaming plan — each
    // micro-batch enriches, then folds map-side onto the ≤|nations|
    // domain before its delta write
    val enriched = OlapQueries.fileFeedSource(spark, feed, orders.schema)
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .select(col("r_name"), col("n_name"),
        cents(col("o_totalprice")).as("order_cents"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_dimjoin_gate").toString
    val out = s"$tmp/out"
    val q = enriched.writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        graft.streaming.StreamingPipeline.writeBatchIdempotent(
          b.groupBy(col("r_name"), col("n_name"))
            .agg(sum(col("order_cents")).as("total_cents"),
              count(lit(1)).as("n_orders")),
          id, out)
      }
      .start()
    try q.awaitTermination() finally q.stop()
    spark.read.parquet(out)
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("total_cents")).as("total_cents"),
        sum(col("n_orders")).as("n_orders"))
  }

  val queries: Map[String, QFn] = Map(
    "q_tpch_rollup_geo" -> (rollupGeoRevenue _),
    "q_tpch_revenue_by_nation_stream" -> (revenueByNationStream _),
    "q_tpch_product_profit" -> (productProfit _),
    "q_tpch_forecast_revenue" -> (forecastRevenue _),
    "q_tpch_min_cost_supp" -> (minCostSupplier _),
    "q_tpch_trade_volume" -> (tradeVolume _),
    "q_tpch_market_share" -> (marketShare _),
    "q_tpch_returned_top" -> (returnedRevenue _),
    "q_tpch_custdist" -> (custDistribution _),
    "q_tpch_big_orders" -> (bigOrders _),
    "q_tpch_disjunct" -> (disjunctRevenue _),
    "q_tpch_sole_late" -> (soleLateSupplier _),
    "q_tpch_top_supplier" -> (topSupplier _),
    "q_tpch_late_orders" -> (lateOrders _),
    "q_tpch_promo_share" -> (promoShare _),
    "q_tpch_idle_customers" -> (idleCustomers _),
    "q_tpch_shipping_priority" -> (shippingPriority _),
    "q_tpch_local_supplier" -> (localSupplierVolume _),
    "q_tpch_small_quantity" -> (smallQuantityRevenue _),
    "q_tpch_bloom_semi" -> (bloomSemiJoin _),
    "q_tpch_no_urgent" -> (noUrgentCustomers _),
    "q_tpch_pricing" -> (pricingSummary _),
    "q_tpch_top_customers" -> (topCustomers _),
    "q_tpch_revenue_by_nation" -> (revenueByNation _),
    "q_tpch_revenue_by_priority" -> (revenueByPriority _),
    "q_tpch_brand_revenue" -> (brandRevenue _),
    "q_tpch_urgent_customers" -> (urgentCustomers _),
  )

  // geography revenue report, shared by batch gate and stream twin
  private val revenueByNationOracle =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    // GROUPING SETS ((r,n),(r),()) with Spark's grouping_id bit order
    // (r_name = high bit)
    "q_tpch_rollup_geo" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name,
        |  coalesce(n_name, 'ALL') AS n_name,
        |  CAST(CASE WHEN r_name IS NULL THEN 3
        |            WHEN n_name IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gid,
        |  count(*) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    // margin = revenue cents − retail cents · integer quantity; both
    // engines run the identical integer chain after one rounded
    // IEEE multiply per money input
    "q_tpch_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    - CAST(round(p_retailprice * 100) AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_cents,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2""".stripMargin,
    "q_tpch_forecast_revenue" ->
      """SELECT
        |  CAST(coalesce(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * CAST(round(l_discount * 1000) AS BIGINT)), 0) AS BIGINT)
        |    AS revenue_microcents,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_tpch_min_cost_supp" ->
      """WITH pp AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sp_cents,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sp_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'
        |  GROUP BY 1, 2),
        |u AS (SELECT *, CAST(sp_cents * 1000000 // sp_qty AS BIGINT) AS unit_micro FROM pp),
        |m AS (SELECT l_partkey, min(unit_micro) AS min_micro FROM u GROUP BY 1)
        |SELECT u.l_partkey, u.l_suppkey, s_name, unit_micro, sp_cents, sp_qty
        |FROM u
        |JOIN m ON u.l_partkey = m.l_partkey AND u.unit_micro = m.min_micro
        |JOIN supplier ON u.l_suppkey = s_suppkey""".stripMargin,
    "q_tpch_trade_volume" ->
      """SELECT rs.r_name AS supp_region, rc.r_name AS cust_region,
        |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |JOIN region rs ON ns.n_regionkey = rs.r_regionkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |JOIN region rc ON nc.n_regionkey = rc.r_regionkey
        |WHERE (rs.r_name = 'EUROPE' AND rc.r_name = 'ASIA')
        |   OR (rs.r_name = 'ASIA' AND rc.r_name = 'EUROPE')
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_tpch_market_share" ->
      """WITH l AS (
        |  SELECT year(o_orderdate) AS order_year,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev,
        |    (SELECT r_name FROM region rr JOIN nation nn ON rr.r_regionkey = nn.n_regionkey
        |     WHERE nn.n_nationkey = s_nationkey) = 'EUROPE' AS from_europe
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region rc ON nc.n_regionkey = rc.r_regionkey
        |  WHERE rc.r_name = 'ASIA')
        |SELECT CAST(order_year AS BIGINT) AS order_year,
        |  CAST(SUM(CASE WHEN from_europe THEN rev ELSE 0 END) AS BIGINT) AS europe_cents,
        |  CAST(SUM(rev) AS BIGINT) AS total_cents,
        |  CAST(SUM(CASE WHEN from_europe THEN rev ELSE 0 END) * 1000
        |    // SUM(rev) AS BIGINT) AS share_permille
        |FROM l GROUP BY 1""".stripMargin,
    "q_tpch_returned_top" ->
      """SELECT CAST(row_number() OVER (ORDER BY lost_cents DESC, o_custkey ASC) AS BIGINT) AS rank,
        |  o_custkey, c_name, c_mktsegment, lost_cents, n_items FROM (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |      AS lost_cents,
        |    count(*) AS n_items
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1) j JOIN customer ON o_custkey = c_custkey
        |ORDER BY lost_cents DESC, o_custkey ASC LIMIT 20""".stripMargin,
    "q_tpch_custdist" ->
      """WITH oc AS (
        |  SELECT o_custkey, count(*) AS c FROM orders
        |  WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
        |SELECT c_count, count(*) AS custdist FROM (
        |  SELECT coalesce(c, 0) AS c_count
        |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey)
        |GROUP BY 1""".stripMargin,
    "q_tpch_big_orders" ->
      """SELECT CAST(row_number() OVER (ORDER BY total_cents DESC, o_orderkey ASC) AS BIGINT) AS rank,
        |  o_orderkey, o_orderdate_ms, c_custkey, c_name, total_cents, sum_qty FROM (
        |  SELECT o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
        |    c_custkey, c_name,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3, 4, 5
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 280)
        |ORDER BY total_cents DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_tpch_disjunct" ->
      """SELECT count(*) AS n_lines,
        |  CAST(coalesce(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)), 0) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_tpch_sole_late" ->
      """WITH late AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY),
        |culprit AS (
        |  SELECT l1.l_orderkey, l1.l_suppkey FROM late l1
        |  WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)),
        |w AS (
        |  SELECT l_suppkey, count(*) AS numwait FROM culprit GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY numwait DESC, l_suppkey ASC) AS BIGINT) AS rank,
        |  l_suppkey, s_name, numwait
        |FROM w JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY numwait DESC, l_suppkey ASC LIMIT 10""".stripMargin,
    "q_tpch_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |      AS revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT l_suppkey, s_name, revenue_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE revenue_cents = (SELECT max(revenue_cents) FROM rev)""".stripMargin,
    "q_tpch_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1""".stripMargin,
    "q_tpch_promo_share" ->
      """WITH a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS promo_cents,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |      AS total_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01')
        |SELECT promo_cents, total_cents,
        |  CAST(promo_cents * 1000 // total_cents AS BIGINT) AS promo_permille
        |FROM a""".stripMargin,
    "q_tpch_idle_customers" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |a AS (SELECT SUM(bal_cents) AS all_sum, count(*) AS all_n FROM c)
        |SELECT c_mktsegment, count(*) AS n_custs,
        |  CAST(SUM(bal_cents) AS BIGINT) AS bal_sum_cents
        |FROM c, a
        |WHERE bal_cents * all_n > all_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1""".stripMargin,
    "q_tpch_shipping_priority" ->
      """SELECT CAST(row_number() OVER (ORDER BY revenue_cents DESC, l_orderkey ASC) AS BIGINT) AS rank,
        |  l_orderkey, revenue_cents, o_orderdate_ms, o_orderpriority FROM (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |    epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1998-07-01'
        |    AND l_shipdate > TIMESTAMP '1998-07-01'
        |  GROUP BY 1, 3, 4)
        |ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q_tpch_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "q_tpch_small_quantity" ->
      """WITH b AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |a AS (SELECT l_partkey, SUM(qty) AS qty_sum, count(*) AS qty_cnt
        |      FROM b GROUP BY 1)
        |SELECT CAST(coalesce(SUM(price_cents), 0) AS BIGINT) AS total_cents,
        |  count(*) AS n_lines
        |FROM b JOIN a USING (l_partkey)
        |WHERE qty * 5 * qty_cnt < qty_sum""".stripMargin,
    "q_tpch_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
        |GROUP BY 1""".stripMargin,
    "q_tpch_no_urgent" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority = '1-URGENT')""".stripMargin,
    "q_tpch_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2""".stripMargin,
    "q_tpch_top_customers" ->
      """SELECT CAST(row_number() OVER (ORDER BY total_cents DESC, o_custkey ASC) AS BIGINT) AS rank,
        |  o_custkey, c_name, total_cents, n_orders FROM (
        |  SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1) j JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_cents DESC, o_custkey ASC LIMIT 10""".stripMargin,
    "q_tpch_revenue_by_nation" -> revenueByNationOracle,
    // stream-final ≡ batch: additive per-batch deltas re-sum to the
    // same report; same oracle
    "q_tpch_revenue_by_nation_stream" -> revenueByNationOracle,
    "q_tpch_revenue_by_priority" ->
      """SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,
    "q_tpch_brand_revenue" ->
      """SELECT CAST(row_number() OVER (ORDER BY revenue_cents DESC, p_brand ASC) AS BIGINT) AS rank,
        |  p_brand, revenue_cents, sum_qty FROM (
        |  SELECT p_brand,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1)
        |ORDER BY revenue_cents DESC, p_brand ASC LIMIT 10""".stripMargin,
    "q_tpch_urgent_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')""".stripMargin,
  )
}
