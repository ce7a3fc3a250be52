package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Replica-group routing — the X6 analog (reference:
  * Pinot replica groups, which pin each query to ONE copy of the
  * segments so tenants/query classes don't contend on the same
  * servers). A Spark library over shared storage has no servers to
  * pin, but the same isolation exists at the layer Spark actually
  * touches: the TABLE DIRECTORY. A serving table is replicated into
  * `n` independent directory copies (different storage prefixes /
  * buckets / mounts in a real deployment), every query routes to the
  * copy its routing key (tenant, session, query class) hashes to —
  * deterministic, so a tenant's scans always hit the same replica's
  * files — and a missing or unreadable replica fails over to the next
  * one with identical results (copies are written from the same
  * frame, and parquet reads are order-insensitive to the gate's
  * sorted compare).
  *
  * What this does NOT pretend to do: balance CPU across executors
  * (Spark's scheduler owns that). What it genuinely gives a 100 TB
  * deployment: object-store rate-limit isolation per tenant class
  * (S3 prefix throttling is per-prefix), blast-radius containment for
  * corrupted/deleted table copies, and zero-downtime table rebuilds
  * (rebuild one replica while the others serve).
  */
object Replicas {

  /** Write `n` independent copies of a serving table under
    * `root/replica=<i>/`. Each copy is written from the same source
    * read — at scale, point each at a different storage prefix.
    */
  def replicate(spark: SparkSession, srcDir: String, root: String, n: Int): Unit = {
    require(n >= 2, s"replication below 2 is just the table (n=$n)")
    val src = spark.read.parquet(srcDir)
    (0 until n).foreach { i =>
      val w = src.write.mode("overwrite")
      // preserve the source's date layout so a routed read keeps the
      // same directory pruning the primary table has
      val wp = if (src.columns.contains("p_date")) w.partitionBy("p_date") else w
      wp.parquet(s"$root/replica=$i")
    }
  }

  /** The replica a routing key pins to: deterministic, uniform. */
  def replicaFor(key: String, n: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key), n)

  /** Read the routed replica for `key`; on a missing/unreadable copy
    * fail over round-robin to the next. Returns the frame plus which
    * replica actually served (the observability a broker logs).
    */
  def read(spark: SparkSession, root: String, key: String, n: Int): (DataFrame, Int) = {
    val start = replicaFor(key, n)
    val tried = (0 until n).map(d => (start + d) % n)
    tried.iterator.flatMap { i =>
      val path = s"$root/replica=$i"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some((spark.read.parquet(path), i)) else None
    }.nextOption().getOrElse(
      throw new java.io.FileNotFoundException(
        s"no replica of $root readable (tried ${tried.mkString(",")})"))
  }
}
