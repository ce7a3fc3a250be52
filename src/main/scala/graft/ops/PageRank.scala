package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted PageRank (Brin & Page 1998) in EXACT integer arithmetic
  * — the random-surfer stationary rank over a weighted digraph,
  * iterated a fixed number of steps:
  *
  *   r'(v) = (1000−d)·S / (1000·N)
  *         + Σ_{u→v} d · r(u) · w(u,v) / (1000 · out_w(u))
  *
  * with every division an integral DIV at DECIMAL(38,0) width, so
  * each iteration is a pure integer function of the graph — the
  * same truncations land on every engine (positive operands:
  * DIV ≡ floor ≡ DuckDB's `//` on HUGEINT) and ranks are
  * hash-checkable, unlike float-damped PageRank whose sums are
  * reduction-order-dependent. `d` is the damping in permille
  * (default 850 = the classic 0.85); `S` the total scaled mass
  * (default 10^12, so six significant digits survive the integer
  * floor at million-node graphs). Dangling-node mass decays — the
  * standard strict-out-edge convention, deterministic on both
  * engines.
  *
  * Scale shape: the classic edge-partitioned iteration — per step,
  * one src-keyed join of the rank table onto the edge list (map-side
  * combinable contribution sum onto dst), one left join back onto
  * the node table; node table and per-step result are
  * checkpoint-pinned so the plan stays ONE iteration deep (no 2^k
  * lineage blowup), through [[NearDup.roundCheckpoint]]'s mode
  * switch: RELIABLE checkpoints (persist → checkpoint → release,
  * surviving executor loss — a billion-node, 50-iteration run
  * recomputes nothing on failure) when `sc.setCheckpointDir` is
  * configured, `localCheckpoint(true)` on local[n] otherwise; each
  * superseded round's blocks/files are released as soon as the next
  * round materializes, so the footprint stays at two rounds. Node
  * count is the only driver-side scalar (bounded metadata). Nothing
  * here assumes the graph fits anywhere: ranks and edges shuffle on
  * their keys, broadcast is left to AQE when a side happens to be
  * small (the bounded type-alphabet gate graph is; a web graph is
  * not).
  */
object PageRank {

  /** (src, dst, w) edges -> (node, r) scaled ranks after `iters`
    * steps. Multi-edges are allowed (weights add). Self-loops count
    * like any edge.
    */
  def ranks(edges: DataFrame, iters: Int, dampPermille: Long = 850L,
      scale: Long = 1000000000000L): DataFrame =
    ranksImpl(edges, iters, dampPermille, scale, seeds = None)

  /** Personalized (topic-sensitive) PageRank — Haveliwala 2002: the
    * random surfer restarts ONLY into `seeds`, so ranks measure
    * proximity to the seed set instead of global centrality. Same
    * exact integer arithmetic; non-seed nodes start at 0 and receive
    * no restart mass. Seeds absent from the graph are ignored (they
    * can neither hold nor route mass); at least one seed must be
    * present.
    */
  def personalizedRanks(edges: DataFrame, seeds: Seq[String], iters: Int,
      dampPermille: Long = 850L, scale: Long = 1000000000000L): DataFrame = {
    require(seeds.nonEmpty, "personalizedRanks needs at least one seed")
    ranksImpl(edges, iters, dampPermille, scale, seeds = Some(seeds))
  }

  private def ranksImpl(edges: DataFrame, iters: Int, dampPermille: Long,
      scale: Long, seeds: Option[Seq[String]]): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(dampPermille >= 0 && dampPermille <= 1000,
      s"dampPermille must be in [0,1000], got $dampPermille")
    require(scale > 0, s"scale must be positive, got $scale")
    import org.apache.spark.sql.GraftShim.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def dec(c: Column) = c.cast("decimal(38,0)")
    // guarded wire cast (the corrWire idiom): fail loudly where the
    // HUGEINT oracle would, never wrap
    def toLong(c: Column, name: String) =
      when(c > lit(Long.MaxValue) || c < lit(Long.MinValue),
        raise_error(concat(
          lit(s"PageRank $name exceeds the BIGINT wire domain: "),
          c.cast("string"))))
        .otherwise(c.cast("long")).as(name)

    val e = edges
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("w").cast("long")).as("w"))
    val withOut = e.join(
      e.groupBy(col("src")).agg(sum(col("w")).as("out_w")), Seq("src"))
    val nodes = NearDup.roundCheckpoint(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    // restart-target count: all nodes, or the seeds present in the
    // graph — a bounded driver scalar either way
    val isTarget: Column = seeds match {
      case None     => lit(true)
      case Some(ss) => col("node").isin(ss: _*)
    }
    val n = nodes.filter(isTarget).count()
    require(n > 0,
      seeds.fold("PageRank needs at least one edge")(
        _ => "no personalization seed is present in the graph"))
    // BigInt intermediates: identical to the oracle's HUGEINT
    // ((1000−d)·S) // (1000·N) whatever the magnitudes
    val base = ((BigInt(1000L - dampPermille) * scale) / (BigInt(1000) * n)).toLong
    val r0 = (BigInt(scale) / n).toLong

    var ranks = nodes.withColumn("r",
      when(isTarget, lit(r0)).otherwise(lit(0L)))
    for (i <- 1 to iters) {
      val contrib = ranks.join(withOut, ranks("node") === withOut("src"))
        .select(col("dst"),
          column(IntegralDivide(
            expression(dec(lit(dampPermille)) * dec(col("r")) * dec(col("w"))),
            expression(dec(lit(1000L)) * dec(col("out_w"))))).as("c"))
        .groupBy(col("dst")).agg(sum(dec(col("c"))).as("s"))
      val next = NearDup.roundCheckpoint(
        nodes.join(contrib, nodes("node") === contrib("dst"), "left")
          .select(col("node"),
            toLong(
              when(isTarget, dec(lit(base))).otherwise(lit(0).cast("decimal(38,0)"))
                + coalesce(col("s"), lit(0).cast("decimal(38,0)")), "r")))
      // round i−1 is superseded once `next` is on stable storage —
      // release its blocks/files eagerly (round 0 is a projection of
      // `nodes`, which every later round still joins: keep it)
      if (i > 1) NearDup.releaseCheckpoint(ranks)
      ranks = next
    }
    // the returned frame is its own checkpoint — `nodes` no longer
    // backs anything once at least one round replaced the initial
    // nodes-derived rank frame
    if (iters >= 1) NearDup.releaseCheckpoint(nodes)
    ranks
  }
}
