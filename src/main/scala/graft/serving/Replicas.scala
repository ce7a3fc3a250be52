package graft.serving

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration

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
  * files — and a missing, partial, or unreadable replica fails over
  * to the next one with identical results (copies are written from
  * the same frame, and parquet reads are order-insensitive to the
  * gate's sorted compare).
  *
  * What this does NOT pretend to do: balance CPU across executors
  * (Spark's scheduler owns that). What it genuinely gives a 100 TB
  * deployment: object-store rate-limit isolation per tenant class
  * (S3 prefix throttling is per-prefix), blast-radius containment for
  * corrupted/deleted table copies, and zero-downtime table rebuilds
  * (rebuild one replica while the others serve).
  */
object Replicas {

  /** Expected-files manifest written inside every replica as the
    * LAST staged file: relative path + byte size per segment. A
    * routed read verifies the listing against it and fails over on
    * any mismatch — a reader routed to a replica mid-rebuild or
    * after a crashed rebuild must never silently serve a partial
    * file set (Pinot brokers never route to a half-pushed segment
    * set). Underscore-prefixed, so parquet scans never see it.
    */
  private val ManifestFile = "_replica_manifest"

  /** Write `n` independent copies of a serving table under
    * `root/replica=<i>/` as BYTE-IDENTICAL file copies — the Pinot
    * semantic (servers replicate SEGMENTS; they never re-encode
    * rows): every parquet file's sort order, row-group stats, bloom
    * filters, and sizes carry over exactly, so a routed read keeps
    * the primary's full pruning layout. The copy parallelizes per
    * (replica, file) across the cluster (the distcp shape) — at
    * 100 TB each task moves one segment, no decode/encode anywhere.
    * At scale, point each replica at a different storage prefix.
    *
    * Publish is ATOMIC per replica: every copy lands in a staging
    * directory (`_stage/<i>`, invisible to readers), its manifest is
    * written last, and only then is the old copy dropped and the
    * stage RENAMED into place — a reader meanwhile sees either the
    * old complete copy, or no directory (fails over), never a
    * partial set; on stores without atomic rename the manifest check
    * in [[read]] provides the same guarantee. Replicas swap one at a
    * time, so n-1 complete copies serve throughout a rebuild.
    */
  def replicate(spark: SparkSession, srcDir: String, root: String, n: Int): Unit = {
    require(n >= 2, s"replication below 2 is just the table (n=$n)")
    val conf = spark.sparkContext.hadoopConfiguration
    val srcPath = new Path(srcDir)
    val fs = srcPath.getFileSystem(conf)
    val base = fs.makeQualified(srcPath)
    // skip underscore/dot entries at every level: _SUCCESS markers,
    // _erase_stage debris, _lease files are not table segments
    def hidden(p: Path) =
      p.getName.startsWith("_") || p.getName.startsWith(".")
    def walk(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.filterNot(s => hidden(s.getPath)).flatMap(s =>
        if (s.isDirectory) walk(s.getPath) else Seq(s.getPath))
    val rels = walk(base)
      .map(_.toString.stripPrefix(base.toString).stripPrefix("/"))
    val rootQ = fs.makeQualified(new Path(root)).toString
    val stageRoot = s"$rootQ/_stage"
    fs.delete(new Path(stageRoot), true) // crashed-rebuild debris
    // ONE cluster job copies every (replica, file) into the stages;
    // executors resolve filesystems from the DRIVER's configuration
    // (credentials, custom fs impls), not a bare classpath default
    val copies = for (i <- 0 until n; rel <- rels)
      yield (s"$base/$rel", s"$stageRoot/$i/$rel")
    val serConf = new SerializableConfiguration(conf)
    spark.sparkContext
      .parallelize(copies, math.min(copies.size, 64).max(1))
      .foreach { case (from, to) =>
        val c = serConf.value
        val fp = new Path(from)
        val tp = new Path(to)
        org.apache.hadoop.fs.FileUtil.copy(
          fp.getFileSystem(c), fp, tp.getFileSystem(c), tp,
          false, true, c)
        ()
      }
    val sizes = rels.map(rel =>
      rel -> fs.getFileStatus(new Path(s"$base/$rel")).getLen)
    (0 until n).foreach { i =>
      // manifest last: a stage without one is by definition partial
      val out = fs.create(new Path(s"$stageRoot/$i/$ManifestFile"), true)
      try out.write(sizes.map { case (r, s) => s"$r\t$s" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
      val target = new Path(s"$rootQ/replica=$i")
      fs.delete(target, true)
      require(fs.rename(new Path(s"$stageRoot/$i"), target),
        s"failed to publish replica $i of $rootQ")
    }
    fs.delete(new Path(stageRoot), true)
  }

  /** The replica a routing key pins to: deterministic, uniform. */
  def replicaFor(key: String, n: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key), n)

  /** Is `root/replica=<i>` a COMPLETE published copy — manifest
    * present and every listed segment present at its recorded size?
    * (One listing round-trip; no file contents read.)
    */
  private def complete(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Boolean = {
    if (!fs.exists(new Path(dir, ManifestFile))) false
    else {
      val in = fs.open(new Path(dir, ManifestFile))
      val want =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).map { l =>
            val t = l.lastIndexOf('\t')
            l.substring(0, t) -> l.substring(t + 1).toLong
          }.toMap
        finally in.close()
      want.forall { case (rel, size) =>
        val p = new Path(dir, rel)
        try fs.getFileStatus(p).getLen == size
        catch { case _: java.io.FileNotFoundException => false }
      }
    }
  }

  /** Read the routed replica for `key`; a missing, PARTIAL
    * (mid-rebuild / crashed-rebuild), or unreadable copy fails over
    * round-robin to the next. Returns the frame plus which replica
    * actually served (the observability a broker logs).
    */
  def read(spark: SparkSession, root: String, key: String, n: Int): (DataFrame, Int) = {
    val start = replicaFor(key, n)
    val tried = (0 until n).map(d => (start + d) % n)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    tried.iterator.flatMap { i =>
      val path = s"$root/replica=$i"
      val p = new Path(path)
      if (fs.exists(p) && complete(fs, p)) Some((spark.read.parquet(path), i))
      else None
    }.nextOption().getOrElse(
      throw new java.io.FileNotFoundException(
        s"no complete replica of $root readable (tried ${tried.mkString(",")})"))
  }
}
