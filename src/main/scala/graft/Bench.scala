package graft

import scala.util.control.NonFatal

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
    // NO periodic-GC tightening: the r8 across-the-board medians
    // drift suggested dead broadcast/shuffle state accumulating in
    // the single bench JVM (ContextCleaner's periodic fallback is
    // 30min, longer than the bench), but a measured A/B/A at sf0.1
    // showed spark.cleaner.periodicGC.interval=30s COSTS ~1s overall
    // (full-GC pauses inside timed runs) and no run reproduced the
    // drift — it was box contention during the judge run, not JVM
    // state. PROFILE.md round 9 has the three-run table.
    val spark = LocalSession.build(cpus,
      Map("spark.sql.autoBroadcastJoinThreshold" -> "64m"))
    spark.sparkContext.setLogLevel("ERROR")

    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // NonFatal only: an OOM/VM error must crash the bench visibly —
    // timings taken in a heap-exhausted JVM are garbage.
    def report(name: String, phase: String, e: Throwable): Unit =
      System.err.println(
        s"[bench] $phase $name failed: ${e.getClass.getName}: ${e.getMessage}")
    names.foreach { n =>                      // warmup (untimed)
      try force(n) catch { case NonFatal(e) => report(n, "warmup", e) }
    }
    // Three timed runs per query, best kept: single-run numbers on a
    // shared box are dominated by scheduler noise (observed 1.3s vs
    // 13s for the same plan); min-of-N is the standard steady-state
    // throughput estimator. The iterative / composition-heavy queries
    // showed multi-second spread even across 3 runs (r5: q49 at
    // 2.13/8.07/2.42s, a 7.25s q01 outlier), so they get 5 timed runs
    // (VERDICT r5 item 7). All runs AND per-query medians are
    // reported so the recorded min is auditable against the spread.
    // q10 joined the set in round 7: two rounds of untouched code
    // drifted its min 1.00 -> 1.31 s with a 6.5 s outlier in the runs
    // (VERDICT r6 item 6) — more runs make the recorded min auditable.
    val extraRuns = Set(
      "q01_pricing_summary", "q10_distinct_agg", "q49_dup_clusters",
      "q50_clean_corpus")
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val results = names.map { name =>
      val nRuns = if (extraRuns(name)) 5 else 3
      val times = (1 to nRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        try { force(name); Some((System.nanoTime() - t0) / 1e9) }
        catch { case NonFatal(e) => report(name, "timed", e); None }
      }
      (name, if (times.nonEmpty) times.min else -1.0, times)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val meds = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + (if (ts.nonEmpty) median(ts) else -1.0)
    }.mkString("{", ",", "}")
    val runs = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // A failed query must make the headline metric WORSE, not smaller:
    // total is -1 (invalid) whenever any query failed, so a regression
    // to a crash can never read as a speedup.
    val total =
      if (results.exists(_._2 < 0)) -1.0
      else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"medians":$meds,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
