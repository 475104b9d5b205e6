package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times SparkEntry.benchQueries against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Each query is forced end-to-end with a noop datasource write (full
  * materialization of every output row/column — unlike count(), which
  * lets Spark prune the plan). One untimed warmup run amortizes JIT +
  * codegen + parquet footer reads, mirroring steady-state service
  * behavior rather than cold JVM start.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    def report(name: String, phase: String, e: Throwable): Unit =
      System.err.println(
        s"[bench] $phase $name failed: ${e.getClass.getName}: ${e.getMessage}")
    names.foreach { n =>                      // warmup (untimed)
      try force(n) catch { case e: Throwable => report(n, "warmup", e) }
    }
    // Two timed runs per query, best kept: single-run numbers on a
    // shared box are dominated by scheduler noise (observed 1.3s vs
    // 13s for the same plan); min-of-N is the standard steady-state
    // throughput estimator.
    val results = names.map { name =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { force(name); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => report(name, "timed", e); None }
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
