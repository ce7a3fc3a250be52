package graft.serving

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** Staged-commit protocol for the materialized-index erases
  * ([[SearchIndex.eraseDocs]], [[AnnIndex.erase]], [[PqIndex.erase]],
  * [[NearDupIndex.erase]]) — closing their pin-then-delete crash
  * window: kept rows used to be pinned only in executor blocks
  * (localCheckpoint) before the affected partition directories were
  * deleted, so JVM/executor loss between the deletes and the
  * re-append silently lost kept rows, and a re-run could find
  * nothing left to erase and return early with the index still
  * holed. Here the kept rows are written DURABLY under
  * `<root>/_erase_stage/leg=<i>` first, and the atomic create of
  * `_erase_stage/_manifest` is the single commit point — the
  * [[graft.streaming.StateCompactor]] discipline:
  *
  *  - crash BEFORE the manifest: debris the next erase deletes;
  *    the index is untouched.
  *  - crash AFTER the manifest (mid-apply): the staged state is
  *    detectable and [[recover]] (called automatically at the start
  *    of every later erase, or explicitly at startup) re-applies it
  *    deterministically — deletes are idempotent, swap-appends
  *    rewrite exactly the staged rows, overwrite legs re-overwrite,
  *    and append-only legs rely on the reader's content-keyed
  *    (delta_id) collapse.
  *
  * The underscore-prefixed stage directory is invisible to every
  * parquet read of the index tables, so readers never see a
  * half-applied erase's staged rows.
  *
  * Concurrency: every entry point ([[run]], [[recover]],
  * [[compactFragmented]] — and therefore every read-path recovery
  * call the indexes make) runs under the root's single-writer
  * [[Lease]]. Without it, a reader's recover() racing an in-flight
  * run() could observe the committed manifest and re-apply it
  * concurrently with the writer's own apply — two appliers
  * interleaving delete+append on a Swap leg duplicate kept rows, and
  * the first finisher's stage-directory delete breaks the other's
  * lazy staged-parquet read mid-write. The lease serializes same-JVM
  * threads on a reentrant per-root lock (so callers already holding
  * it — Serving.eraseUser, Maintenance — nest for free) and
  * cross-JVM writers on the `_lease` file; read-path recovery's
  * common case (no manifest) stays a single existence check with no
  * locking at all.
  */
private[graft] object EraseStage {

  private def withRootLock[T](spark: SparkSession, root: String)(body: => T): T =
    Lease.withLease(spark, root, "erase-stage")(body)

  /** One table rewrite within an erase.
    *  - `Swap(table, partCol, affected, sortCols, options)`: delete
    *    the affected `partCol=<v>` directories, append the staged
    *    rows back (which by construction touch only those
    *    partitions). When `sortCols` is non-empty, [[apply]]
    *    repartitions by the partition column and re-sorts within
    *    partitions before writing — preserving the one-file-per-
    *    partition sorted layout the serving write paths use.
    *  - `Overwrite(table, options, sortCol)`: replace the whole table
    *    with the staged rows (per-table writer options, e.g. bloom
    *    filters). `sortCol` records a required sort layout IN THE
    *    MANIFEST so [[apply]] re-sorts after re-reading the staged
    *    files — the staged read may combine range-partitioned files
    *    in arbitrary order, which would otherwise interleave sorted
    *    runs and degrade per-file min/max pruning (the
    *    [[NearDupIndex]] docs/postings layout).
    *  - `Append(table)`: plain append of the staged rows (for
    *    content-keyed delta tables whose readers dedup).
    * `table` is root-relative; "" is the root itself — legal for
    * Swap (partition dirs swap under the root) but forbidden for
    * Overwrite: overwriting the root would delete the `_erase_stage`
    * directory its own lazily-read staged rows live in, mid-apply.
    */
  sealed trait Leg { def table: String }
  /** `shards > 1` splits each rewritten partition across that many
    * write tasks (hash of the sort key picks the shard) — the
    * scale-out knob for a partition too large for one task; up to
    * `shards` files per partition (hash assignment of (partition,
    * shard) pairs to tasks can collide), every file internally
    * sorted, so per-file min/max pruning holds. Recorded in the
    * manifest (8th field) so recovery replays the identical layout.
    */
  final case class Swap(table: String, partCol: String,
    affected: Seq[String], sortCols: Seq[String] = Nil,
    options: Map[String, String] = Map.empty, shards: Int = 1) extends Leg
  final case class Overwrite(table: String,
    options: Map[String, String] = Map.empty,
    sortCol: Option[String] = None) extends Leg
  final case class Append(table: String) extends Leg
  /** Exactly-once APPEND of the staged rows into a partitioned table
    * by FILE MOVE: [[stage]] writes the rows already in their final
    * form (partitioned by `partCol`, sorted within files, writer
    * `options` applied — sort/bloom must happen at stage time, the
    * files are never rewritten), and [[apply]] renames each staged
    * file into its `table/partCol=<v>/` directory. A re-applied move
    * is a per-file no-op (destination exists → skip), so recovery
    * after a crash mid-apply completes the remaining moves without
    * duplicating rows — the idempotent append [[Append]] cannot give.
    * Existing table files are never read or touched: the leg costs
    * O(staged rows), not O(touched partitions' accumulated data) — an
    * hourly ingest fold appends the hour, it does not rewrite the
    * day.
    */
  final case class MoveIn(table: String, partCol: String,
    sortCols: Seq[String] = Nil,
    options: Map[String, String] = Map.empty) extends Leg

  // the manifest is a TSV with comma-joined lists — any of these in a
  // field would corrupt the line format silently, so refuse at stage
  // time (current callers only pass integer/date partition values and
  // fixed parquet options; this pins the latent contract)
  private val seps = Seq('\t', '\n', '\r', ',')
  private def clean(what: String, v: String, extra: Seq[Char] = Nil): Unit =
    require(!v.exists((seps ++ extra).contains(_)),
      s"EraseStage $what contains a manifest separator character: '$v'")
  private def cleanOpts(o: Map[String, String]): Unit =
    o.foreach { case (k, v) =>
      clean("option key", k, Seq('=')); clean("option value", v) }
  private def validate(leg: Leg): Unit = leg match {
    case Swap(t, pc, a, sc, o, sh) =>
      clean("table", t); clean("partCol", pc)
      a.foreach(clean("partition value", _))
      sc.foreach(clean("sort column", _))
      cleanOpts(o)
      require(sh >= 1, s"Swap shards $sh < 1")
      require(sh == 1 || sc.nonEmpty,
        "Swap shards > 1 needs sortCols: the shard is a hash of the sort key")
    case Overwrite(t, o, sc) =>
      require(t.nonEmpty,
        "EraseStage.Overwrite(\"\") would overwrite the root and " +
          "delete the _erase_stage directory its own staged read " +
          "needs; give the root's tables their own subdirectories")
      clean("table", t)
      cleanOpts(o)
      sc.foreach(clean("sortCol", _))
    case Append(t) => clean("table", t)
    case MoveIn(t, pc, sc, o) =>
      clean("table", t)
      require(pc.nonEmpty, "EraseStage.MoveIn needs a partition column")
      clean("partCol", pc)
      sc.foreach(clean("sort column", _))
      cleanOpts(o)
  }

  private def optStr(o: Map[String, String]): String =
    o.map { case (k, v) => s"$k=$v" }.mkString(",")

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tablePath(root: String, table: String): String =
    if (table.isEmpty) root else s"$root/$table"

  private def stageDir(root: String) = s"$root/_erase_stage"

  /** Stage every leg's kept rows durably, commit the manifest, apply.
    * Any previously committed-but-unapplied stage is completed first.
    */
  def run(spark: SparkSession, root: String,
      legs: Seq[(Leg, DataFrame)]): Unit = withRootLock(spark, root) {
    recover(spark, root)
    stage(spark, root, legs)
    apply(spark, root)
  }

  /** The durable half of [[run]] — staged writes + manifest commit,
    * NO apply; package-visible so the crash-recovery specs can leave
    * an index exactly at (or past) the commit point and assert
    * [[recover]] completes it.
    */
  private[graft] def stage(spark: SparkSession, root: String,
      legs: Seq[(Leg, DataFrame)]): Unit = withRootLock(spark, root) {
    legs.foreach { case (l, _) => validate(l) }
    val f = fs(spark, root)
    // fencing: a holder paused past the lease TTL and taken over must
    // not resume by deleting the NEW owner's stage — renew throws
    // LeaseHeldException when the lease file no longer carries our
    // nonce, aborting the zombie before its first destructive touch
    Lease.renew(spark, root)
    f.delete(new Path(stageDir(root)), true) // pre-manifest debris
    legs.zipWithIndex.foreach { case ((l, kept), i) =>
      l match {
        case MoveIn(_, pc, sc, o) =>
          // final-form staging: these files MOVE into the table
          // untouched, so the layout (one sorted file per partition)
          // and the writer options (blooms) must apply HERE
          val laid = kept.repartition(col(pc))
            .sortWithinPartitions((pc +: sc).map(col): _*)
          val w = laid.write.mode("overwrite").partitionBy(pc)
          o.foreach { case (k, v) => w.option(k, v) }
          w.parquet(s"${stageDir(root)}/leg=$i")
        case _ =>
          kept.write.mode("overwrite").parquet(s"${stageDir(root)}/leg=$i")
      }
    }
    // COMMIT POINT: atomic create of the manifest inside the stage.
    // Line format (up to 8 tab-separated fields; readers pad shorter
    // lines — absent shards means 1). The 8th field is written ONLY
    // when shards > 1, the same encoding-by-omission the older
    // 5/7-field formats used for sort/options: an ordinary erase
    // staged by this version stays recoverable by a prior-version
    // reader in a mixed-version fleet; only a genuinely sharded swap
    // (a layout the old reader cannot reproduce) fails loudly there.
    //   idx  kind  table  partCol  affected  sort  options  [shards]
    val out = f.create(new Path(s"${stageDir(root)}/_manifest"), false)
    try out.write(legs.zipWithIndex.map { case ((l, _), i) =>
      l match {
        case Swap(t, pc, a, sc, o, sh) =>
          val base = s"$i\tswap\t$t\t$pc\t${a.mkString(",")}\t${sc.mkString(",")}\t${optStr(o)}"
          if (sh > 1) s"$base\t$sh" else base
        case Overwrite(t, o, sc) =>
          s"$i\toverwrite\t$t\t\t\t${sc.getOrElse("")}\t${optStr(o)}"
        case Append(t) => s"$i\tappend\t$t\t\t\t\t"
        case MoveIn(t, pc, sc, o) =>
          // sort/options already baked into the staged files; the
          // manifest records them for the audit trail only. An older
          // reader fails loudly on the unknown kind — a layout it
          // cannot reproduce, same stance as the shards field.
          s"$i\tmovein\t$t\t$pc\t\t${sc.mkString(",")}\t${optStr(o)}"
      }
    }.mkString("", "\n", "\n").getBytes("UTF-8")) finally out.close()
  }

  /** Complete a committed-but-unapplied erase if one is staged;
    * returns whether one was. Idempotent; safe at startup.
    */
  def recover(spark: SparkSession, root: String): Boolean = {
    // fast path, no locking: the read-path recovery calls hit this on
    // every cache miss and almost never find a manifest
    val f = fs(spark, root)
    if (!f.exists(new Path(s"${stageDir(root)}/_manifest"))) false
    else withRootLock(spark, root) {
      // re-check under the lease: the in-flight writer we waited on
      // (or another reader's recovery) may have consumed the stage
      if (!f.exists(new Path(s"${stageDir(root)}/_manifest"))) false
      else { apply(spark, root); true }
    }
  }

  /** Small-file maintenance for an append-fragmented partitioned
    * table — the compaction side of the same staged-commit protocol
    * (Pinot's minion merge task analog): every partition directory
    * holding at least `minFiles` parquet files is rewritten as one
    * file (its rows staged durably, then swapped in); partitions
    * below the threshold are neither read nor written. Returns the
    * partition values compacted (empty = nothing fragmented).
    * Quiesced maintenance slot; crash-mid-compact is recoverable via
    * [[recover]] exactly like an erase.
    */
  private[graft] def compactFragmented(spark: SparkSession, root: String,
      table: String, partCol: String,
      minFiles: Int): Seq[String] = withRootLock(spark, root) {
    recover(spark, root)
    val f = fs(spark, root)
    val tp = new Path(tablePath(root, table))
    val frag =
      if (!f.exists(tp)) Seq.empty[String]
      else f.listStatus(tp).toSeq
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter(_.getName.startsWith(s"$partCol="))
        .filter(p => f.listStatus(p)
          .count(_.getPath.getName.endsWith(".parquet")) >= minFiles)
        .map(_.getName.stripPrefix(s"$partCol="))
    if (frag.nonEmpty) {
      val kept = spark.read.parquet(tp.toString)
        .filter(col(partCol).cast("string").isin(frag: _*))
        // one shuffle task per fragmented partition -> one output file
        // per rewritten directory
        .repartition(frag.size, col(partCol))
      run(spark, root, Seq(Swap(table, partCol, frag) -> kept))
    }
    frag
  }

  private def apply(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val mp = new Path(s"${stageDir(root)}/_manifest")
    val in = f.open(mp)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toVector
      finally in.close()
    lines.foreach { line =>
      // fencing, re-checked before EVERY destructive leg (not just at
      // entry): apply can run for minutes across many table rewrites,
      // and a TTL takeover mid-apply would otherwise leave the old
      // holder racing the new owner's own recovery of the same
      // manifest — the exact two-appliers interleave the lease
      // exists to prevent, confined to the takeover edge. renew
      // re-stamps our heartbeat when we still own the lease (keeping
      // long applies fresh) and throws when displaced.
      Lease.renew(spark, root)
      // pad short lines instead of MatchError-ing: a manifest written
      // by an OLDER format (fewer fields) must still recover — absent
      // trailing fields mean "no sort / no options", exactly what the
      // old format encoded by omission. MORE fields than we know is a
      // NEWER writer; recovering with fields silently dropped could
      // corrupt the layout, so that fails loudly instead.
      val fields = line.split("\t", -1)
      require(fields.length <= 8,
        s"EraseStage manifest line has ${fields.length} fields; this " +
          s"reader understands 8 — written by a newer version? '$line'")
      val Array(i, kind, table, partCol, affected, sort, opts, shardsF) =
        fields.padTo(8, "")
      val shards = if (shardsF.isEmpty) 1 else shardsF.toInt
      // def, not val: a movein leg moves FILES and must not pay (or
      // depend on) a schema-inferring read of its staged directory
      def staged = spark.read.parquet(s"${stageDir(root)}/leg=$i")
      val target = tablePath(root, table)
      def withOpts(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]) = {
        opts.split(",").filter(_.nonEmpty).foreach { kv =>
          val eq = kv.indexOf('=')
          w.option(kv.substring(0, eq), kv.substring(eq + 1))
        }
        w
      }
      kind match {
        case "swap" =>
          affected.split(",").filter(_.nonEmpty).foreach(v =>
            f.delete(new Path(s"$target/$partCol=$v"), true))
          // re-establish the serving layout when the manifest records
          // one: one shuffle task (= one file) per partition, sorted
          // within — the staged round-trip loses both otherwise. The
          // sort LEADS with the partition column so the dynamic-
          // partition write's required ordering is satisfied; Spark
          // otherwise inserts its own NON-STABLE sort by the
          // partition column and scrambles the layout (see
          // TableManager.writePartitioned's note)
          val sortCols = sort.split(",").filter(_.nonEmpty).toSeq
          val laid =
            if (sortCols.isEmpty) staged
            else if (shards <= 1)
              staged.repartition(col(partCol))
                .sortWithinPartitions((partCol +: sortCols).map(col): _*)
            else {
              // shard large partitions across `shards` write tasks by
              // a hash of the sort key: `shards` files per rewritten
              // partition, each internally sorted
              val nAffected = math.max(
                affected.split(",").count(_.nonEmpty), 1)
              staged.repartition(nAffected * shards, col(partCol),
                  pmod(xxhash64(sortCols.map(col): _*), lit(shards.toLong)))
                .sortWithinPartitions((partCol +: sortCols).map(col): _*)
            }
          withOpts(laid.write.mode("append").partitionBy(partCol))
            .parquet(target)
        case "overwrite" =>
          // re-sort when the manifest records a layout: the staged
          // read may combine the (sorted) staged files in arbitrary
          // order, and interleaved runs would break per-file min/max
          // pruning on the rewritten table
          val sorted = if (sort.nonEmpty) staged.sort(col(sort)) else staged
          withOpts(sorted.write.mode("overwrite")).parquet(target)
        case "append" =>
          withOpts(staged.write.mode("append")).parquet(target)
        case "movein" =>
          // idempotent per-file moves: destination exists → that file
          // was moved by a prior apply attempt, skip; otherwise the
          // atomic rename lands it. Recovery after a crash mid-leg
          // completes exactly the remaining files.
          val legDir = new Path(s"${stageDir(root)}/leg=$i")
          f.listStatus(legDir).filter(_.isDirectory)
            .filter(_.getPath.getName.startsWith(s"$partCol="))
            .foreach { pd =>
              val destDir = new Path(s"$target/${pd.getPath.getName}")
              f.mkdirs(destDir)
              f.listStatus(pd.getPath).map(_.getPath)
                .filter(_.getName.endsWith(".parquet")).foreach { src =>
                  val dst = new Path(destDir, src.getName)
                  if (f.exists(dst))
                    require(!f.exists(src),
                      s"EraseStage movein: staged and destination both " +
                        s"exist for $dst — refusing to guess which is live")
                  else require(f.rename(src, dst),
                    s"EraseStage movein rename failed: $src -> $dst")
                }
            }
      }
    }
    // the stage directory is the new owner's recovery source if we
    // were displaced mid-apply — fence the final delete too
    Lease.renew(spark, root)
    f.delete(new Path(stageDir(root)), true)
  }
}
