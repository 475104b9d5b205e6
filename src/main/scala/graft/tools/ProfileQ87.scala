package graft.tools

import org.apache.spark.sql.DataFrame
import graft.Tables
import graft.ops.Sessions

/** Isolated profile for the q87 two-phase shuffle rank (VERDICT r6
  * #5: BENCH min drifted 0.27 → 0.63 s across two rounds of untouched
  * `Sessions.scala`). Times each stage of the decomposition and the
  * composed query over many runs, and prints the formatted physical
  * plan so the shape can be pinned in PLANS.md (it never was).
  * Scratch tool, not part of the library surface.
  */
object ProfileQ87 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")

    def times(name: String, runs: Int)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val s = ts.sorted
      println(f"[q87] $name%-24s min ${s.head}%.3f  med ${s(s.size / 2)}%.3f  " +
        f"max ${s.last}%.3f  runs ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    times("docs_scan", 5)(docs)
    val ranked = Sessions.shuffleRank(docs, "doc_id", "seed1")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("shuffle_rank"))
    times("shuffle_rank_full", 10)(ranked)
    println("[q87] ---- formatted plan ----")
    println(ranked.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
