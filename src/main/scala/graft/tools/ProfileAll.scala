package graft.tools

import scala.util.control.NonFatal

/** Scratch profiling main: time EVERY SparkEntry query at the given SF
  * (warm + best-of-2), sorted slowest-first — the hotspot finder behind
  * PROFILE.md. Not part of the library surface.
  */
object ProfileAll {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val results = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      try {
        once(n) // warm
        Some(n -> math.min(once(n), once(n)))
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[all] $n FAILED: ${e.getMessage}")
          None
      }
    }
    results.sortBy(-_._2).foreach { case (n, t) =>
      println(f"[all] $n%-28s $t%8.3f s")
    }
    println(f"[all] TOTAL ${results.map(_._2).sum}%.3f s over ${results.size} queries")
    spark.stop()
  }
}
