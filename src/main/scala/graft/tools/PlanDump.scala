package graft.tools

import java.nio.file.{Files, Paths}

/** Dump query plans for the optimization-round evidence trail
  * (plans/rNN/<query>_{before,after}.txt): for each named query,
  * write the pre-execution `explain("formatted")` output AND — after
  * one noop-sink execution — the AQE-final executed plan (join
  * strategies and coalesced exchanges only exist there). Queries that
  * build warehouse/state assets run their side effects exactly as the
  * bench's untimed warmup would.
  *
  * Usage: runMain graft.tools.PlanDump OUT_DIR SUFFIX q... [q...]
  *   e.g. runMain graft.tools.PlanDump plans/r18 before q269_curation_maintained
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      Map("spark.sql.autoBroadcastJoinThreshold" -> "64m"))
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val initial = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // Execute THIS df's own physical plan (an RDD count) so the
      // AdaptiveSparkPlan materializes its final stages — a separate
      // noop write would run a different QueryExecution and leave
      // this one's plan at isFinalPlan=false.
      df.queryExecution.executedPlan.execute().count()
      val fin = df.queryExecution.executedPlan.toString
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
        s"== $name @ $sfDir (${suffix}) ==\n\n" +
          "---- initial (explain formatted) ----\n" + initial +
          "\n---- executed (AQE final) ----\n" + fin)
      println(s"[plan-dump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
