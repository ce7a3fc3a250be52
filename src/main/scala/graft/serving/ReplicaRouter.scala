package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Broker-side replica routing for SERVING tables — the general form
  * of the count-path routing the X6 gate first exercised, now shared
  * by every serving query class (the reference routes EVERY query
  * through replica groups — pinot orders_raw_upsert_table.json:64-66
  * — not just one table): a serving table is replicated n ways on
  * first routed use ([[Replicas.replicate]]), each query pins to the
  * copy its tenant key hashes to, and a missing copy fails over with
  * identical results.
  *
  * Freshness rides the serving state's CONTENT stamp
  * ([[Serving.metaStamp]]: max ts + last applied batch id): an
  * incremental refresh rewrites the primary in place under the same
  * root — which directory mtimes do not reliably surface — so the
  * stamp is what triggers re-replication, exactly like brokers
  * re-routing when a new segment push lands.
  *
  * Caching discipline (the broker metadata cache): the replica-set
  * location is cached per (serving root, table) and each ROUTED COPY
  * is pinned per replica index — between stamp changes a routed query
  * re-lists nothing and re-reads nothing; a stamp change drops the
  * superseded pins and re-replicates from the refreshed primary.
  */
object ReplicaRouter {

  /** Replication factor for routed serving tables. */
  val N = 2

  // (servingRoot/table) -> (replica set root, content stamp)
  private val sets = scala.collection.concurrent.TrieMap
    .empty[String, (String, (Long, Long, Long))]
  // (replica set root, replica idx) -> pinned routed frame
  private val pins = scala.collection.concurrent.TrieMap
    .empty[(String, Int), DataFrame]

  /** Read `table` of `dataDir`'s serving layout through the replica
    * set, pinned to the copy `tenant` hashes to. Every copy is
    * written from the same primary read, so results are identical
    * whichever replica serves — what lets routed gates share the
    * unrouted gates' oracles.
    */
  def table(spark: SparkSession, dataDir: String, table: String,
      tenant: String = "tenant-analytics"): DataFrame = {
    val servingRoot = Serving.materialize(spark, dataDir)
    val stamp = Serving.metaStamp(spark, servingRoot)
    val key = s"$servingRoot/$table"
    val replicaRoot = sets.get(key) match {
      case Some((p, s)) if s == stamp => p
      case _ => this.synchronized {
        sets.get(key) match { // re-check under the replicate lock
          case Some((p, s)) if s == stamp => p
          case prev =>
            val p = prev.map(_._1).getOrElse(
              java.nio.file.Files.createTempDirectory("graft_replicas").toString)
            Replicas.replicate(spark, s"$servingRoot/$table", p, n = N)
            // drop pins of the superseded generation
            pins.keys.filter(_._1 == p).foreach { k =>
              pins.remove(k).foreach(_.unpersist(blocking = false))
            }
            sets.put(key, (p, stamp))
            p
        }
      }
    }
    val idx = Replicas.replicaFor(tenant, N)
    pins.getOrElseUpdate((replicaRoot, idx), {
      val (df, _) = Replicas.read(spark, replicaRoot, tenant, N)
      // serving tables are date-sliced into many small files; cache
      // them as a few fat blocks, not one block per file — a ~100 ms
      // warm lookup is mostly per-task scheduling at 30 partitions
      // of a 1 MB table (measured), and every serving query rescans
      // this pin. 8 blocks keeps parallelism for the rare big table.
      df.coalesce(8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  /** The replica-set root currently serving (dataDir, table), if one
    * has been built — observability for tests and ops (a broker's
    * routing-table dump).
    */
  def replicaRootFor(spark: SparkSession, dataDir: String,
      table: String): Option[String] = {
    val servingRoot = Serving.materialize(spark, dataDir)
    sets.get(s"$servingRoot/$table").map(_._1)
  }
}
