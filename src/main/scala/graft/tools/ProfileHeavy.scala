package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isolated profile for the CMS-gated heavy hitters (q146): the
  * gated exact count vs the plain full-universe aggregate, with the
  * shuffle rows/bytes each one writes — the thing the gate exists to
  * shrink. Scratch tool.
  */
object ProfileHeavy {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 3-gram shingles: the long-tail universe (~27k distinct at
    // sf0.1, ~120 above the threshold) where the gate means something
    val toks = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(graft.ops.TextAnalysis.shingles(
        graft.functions.Fns.tokens($"text"), 3)).as("tok"))
    val threshold = 20L

    def shuffleOf(name: String)(f: => DataFrame): Unit = {
      val df = f
      df.collect()
      val (recs, bytes) = PlanWalk.shuffleWritten(df)
      val t0 = System.nanoTime()
      val df2 = f
      df2.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[heavy] $name%-22s shuffle $recs%,12d rows ${bytes / 1024.0 / 1024.0}%8.1f MiB  wall $sec%.2f s")
    }

    println(s"[heavy] occurrences: ${toks.count()}, " +
      s"distinct: ${toks.distinct().count()}")
    shuffleOf("plain group+having") {
      toks.groupBy($"tok").agg(count(lit(1)).as("n"))
        .filter($"n" >= threshold)
    }
    shuffleOf("cms-gated (q146)") {
      graft.ops.Sketches.heavyHitters(toks, $"tok", threshold,
        d = 4, w = 1 << 14)
    }
    spark.stop()
  }
}
