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

    // A failed query must fail the benchmark loudly, never fold its
    // time-to-exception into the total as if it were a fast result.
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] query $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          Left(e.getClass.getSimpleName)
      }
    }

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    names.foreach { case (name, fn) => run(name, fn) } // warm-up pass
    val results = names.map { case (name, fn) => name -> run(name, fn) }

    val qs = results.map {
      case (k, Right(v)) => "\"" + k + "\":" + v
      case (k, Left(_))  => "\"" + k + "\":-1"
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(e)) => "\"" + k + ": " + e + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, Right(v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._2.isLeft)) sys.exit(1)
  }
}
