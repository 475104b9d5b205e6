package graft.tools

import org.apache.spark.sql.functions._

/** Round-15 crossover probe: exact vs sketch-pruned budget selection
  * as the corpus row count grows at a FIXED budget. The exact form's
  * cost is the whole-corpus single-partition sort; the pruned form
  * pays ~1.2 s of fixed costs (sketch + two 1-row gates) and a
  * budget-sized sort. ScaleSoakR15 shows exact winning below ~300k
  * rows; this probe carries the curve to the row counts where the
  * global sort becomes the bottleneck — the regime the operator
  * exists for.
  */
object ProfileBudget {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (n <- Seq(300000L, 3000000L, 30000000L)) {
      val scored = spark.range(0L, n).select($"id".as("doc_id"),
          pmod(conv(substring(md5(concat($"id".cast("string"), lit("#s"))), 1, 8), 16, 10)
            .cast("long"), lit(1000000L)).as("score_ppm"),
          lit(60L).as("cost"))
        .localCheckpoint()
      def timed(what: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(f"[profile-budget] n=$n%9d $what%-7s " +
          f"${(System.nanoTime() - t0) / 1e9}%8.3f s ($rows rows)")
      }
      // pruned FIRST and twice: the exact form's giant single-partition
      // sort leaves GC pressure that would tax whatever runs after it
      timed("PRUNED") {
        graft.ops.Prep.selectUnderBudgetPruned(scored, "doc_id",
          "score_ppm", "cost", budget = 120000L).count()
      }
      timed("PRUNED2") {
        graft.ops.Prep.selectUnderBudgetPruned(scored, "doc_id",
          "score_ppm", "cost", budget = 120000L).count()
      }
      timed("EXACT") {
        graft.ops.Prep.selectUnderBudget(scored, "doc_id", "score_ppm",
          "cost", budget = 120000L).count()
      }
      scored.unpersist()
    }
    spark.stop()
  }
}
