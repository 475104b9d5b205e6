package graft.tools

import scala.util.control.NonFatal

/** Bench a SUBSET of SparkEntry.benchQueries-style entries with the
  * exact Bench methodology (noop sink, one untimed warmup, min of 3
  * interleaved timed runs) — the per-query A/B loop for optimization
  * rounds without paying the full 40-entry suite per iteration.
  *
  * Usage: runMain graft.tools.BenchSome q269_curation_maintained ...
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      Map("spark.sql.autoBroadcastJoinThreshold" -> "64m"))
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Double, Int)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks.toLong)
          val d = (for {
            a <- s.stageInfo.completionTime
            b <- s.stageInfo.submissionTime
          } yield (a - b) / 1e3).getOrElse(-1.0)
          val scopes = s.stageInfo.rddInfos
            .flatMap(_.scope).map(_.name).distinct
            .mkString(" | ").take(160)
          stageLog.add((scopes, d, s.stageInfo.numTasks))
        }
      })
    def force(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      try force(n)
      catch { case NonFatal(e) => println(s"[bench-some] warmup $n FAILED: $e") }
    }
    val runs = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val counts = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    val verbose = sys.env.contains("SPARK_GRAFT_BENCH_STAGES")
    for (r <- 1 to 3; n <- names) {
      val (j0, s0, t0c) = (jobs.get, stages.get, tasks.get)
      stageLog.clear()
      val t0 = System.nanoTime()
      try {
        force(n)
        runs(n) :+= (System.nanoTime() - t0) / 1e9
        if (r == 1)
          counts(n) = (jobs.get - j0, stages.get - s0, tasks.get - t0c)
        if (r == 1 && verbose) {
          import scala.jdk.CollectionConverters._
          stageLog.asScala.toSeq.sortBy(-_._2).take(8).foreach {
            case (nm, d, tk) =>
              println(f"[bench-some]   stage ${d}%7.2f s  $tk%4d tasks  $nm")
          }
        }
      } catch { case NonFatal(e) => println(s"[bench-some] timed $n FAILED: $e") }
    }
    names.foreach { n =>
      val r = runs(n)
      if (r.nonEmpty) {
        val (j, st, tk) = counts.getOrElse(n, (0L, 0L, 0L))
        println(f"[bench-some] $n%-34s min ${r.min}%7.3f  jobs $j%3d stages $st%3d tasks $tk%5d  runs ${r.map(t => f"$t%.2f").mkString(" ")}")
      } else println(s"[bench-some] $n NO RUNS")
    }
    spark.stop()
  }
}
