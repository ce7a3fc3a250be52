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
    * `root/replica=<i>/` as BYTE-IDENTICAL file copies — the Pinot
    * semantic (servers replicate SEGMENTS; they never re-encode
    * rows): every parquet file's sort order, row-group stats, bloom
    * filters, and sizes carry over exactly, so a routed read keeps
    * the primary's full pruning layout. The copy parallelizes per
    * FILE across the cluster (the distcp shape) — at 100 TB each
    * task moves one segment, no decode/encode anywhere. (The old
    * row-rewrite copy also hit Spark's inserted-sort hazard — see
    * TableManager.writePartitioned — silently degrading the copies'
    * within-file order.) At scale, point each replica at a different
    * storage prefix.
    */
  def replicate(spark: SparkSession, srcDir: String, root: String, n: Int): Unit = {
    require(n >= 2, s"replication below 2 is just the table (n=$n)")
    val conf = spark.sparkContext.hadoopConfiguration
    val srcPath = new org.apache.hadoop.fs.Path(srcDir)
    val fs = srcPath.getFileSystem(conf)
    val base = fs.makeQualified(srcPath)
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.flatMap(s =>
        if (s.isDirectory) walk(s.getPath) else Seq(s.getPath))
    val rels = walk(base)
      .map(_.toString.stripPrefix(base.toString).stripPrefix("/"))
    val rootQ = fs.makeQualified(new org.apache.hadoop.fs.Path(root)).toString
    (0 until n).foreach(i =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$rootQ/replica=$i"), true))
    val copies = for (i <- 0 until n; rel <- rels)
      yield (s"$base/$rel", s"$rootQ/replica=$i/$rel")
    // one task per (replica, file): executors copy bytes directly
    // between filesystems (tasks resolve FileSystems from the
    // classpath-default Configuration, the executor-side norm)
    spark.sparkContext
      .parallelize(copies, math.min(copies.size, 64).max(1))
      .foreach { case (from, to) =>
        val c = new org.apache.hadoop.conf.Configuration()
        val fp = new org.apache.hadoop.fs.Path(from)
        val tp = new org.apache.hadoop.fs.Path(to)
        org.apache.hadoop.fs.FileUtil.copy(
          fp.getFileSystem(c), fp, tp.getFileSystem(c), tp,
          false, true, c)
        ()
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
