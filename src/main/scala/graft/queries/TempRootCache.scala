package graft.queries

import org.apache.spark.sql.SparkSession

/** One materialized temp-dir root per DATASET FINGERPRINT — the
  * build-once idiom every served/evolved/tiered gate uses so repeated
  * gate and bench invocations reuse a single build.
  *
  * A dataset regenerated in place gets a new fingerprint and a fresh
  * root; the superseded root for the same source path is deleted or
  * each regeneration accumulates a full corpus copy (found by round-5
  * review — this class exists so that eviction logic lives ONCE, not
  * copy-pasted per gate).
  */
private[queries] final class TempRootCache(prefix: String,
    table: String = "events") {
  private val byFp = scala.collection.concurrent.TrieMap.empty[String, String]
  private val byPath = scala.collection.concurrent.TrieMap.empty[String, String]

  /** The root for `dir`'s current data, building it on first use. */
  def root(spark: SparkSession, dir: String)(build: String => Unit): String = {
    val fp = graft.Tables.fingerprint(spark, s"$dir/$table.parquet")
    val r = byFp.getOrElseUpdate(fp, {
      val p = java.nio.file.Files.createTempDirectory(prefix).toString
      build(p)
      p
    })
    byPath.put(dir, fp).filter(_ != fp)
      .flatMap(byFp.remove).foreach { old =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(old))
      }
    r
  }
}
