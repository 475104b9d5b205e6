package graft.tools

import org.apache.spark.sql.functions._

/** Round-15 crossover probe: exact vs sketch-pruned budget selection
  * as the corpus row count grows at a FIXED budget. The exact form's
  * cost is the whole-corpus single-partition sort; the pruned form
  * pays ~1.2 s of fixed costs (sketch + the bucket-cost pass) and a
  * budget-sized sort. ScaleSoakR15 shows exact winning below ~300k
  * rows; this probe carries the curve to the row counts where the
  * global sort becomes the bottleneck — the regime the operator
  * exists for.
  *
  * Round 16: the coverage RETRY loop is gone — the bucket-cost pass
  * prices every candidate tau exactly in one scan, so the covering
  * tau is picked one-shot BY CONSTRUCTION (0 retries on any input,
  * including the anti-correlated leg below, which used to force
  * keep-doubling rescans). Also new: the PER-GROUP leg with a
  * planted 90%-mass domain — the skewed-domain case where the
  * homogeneous partitioned window serializes the big domain's sort
  * and the per-group pruned form sorts only its covering stratum.
  */
object ProfileBudget {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // anti-correlated leg: cheap high scorers (the shape that used to
    // trigger coverage retries) — one-shot tau must still cover
    {
      val n = 3000000L
      val scored = spark.range(0L, n).select($"id".as("doc_id"),
          when($"id" < n / 2,
            lit(900000L) + pmod(conv(substring(md5(concat($"id".cast("string"),
              lit("#a"))), 1, 8), 16, 10).cast("long"), lit(90000L)))
            .otherwise(pmod(conv(substring(md5(concat($"id".cast("string"),
              lit("#a"))), 1, 8), 16, 10).cast("long"), lit(800000L)))
            .as("score_ppm"),
          when($"id" < n / 2, 1L).otherwise(100L).as("cost"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val rows = graft.ops.Prep.selectUnderBudgetPruned(scored, "doc_id",
        "score_ppm", "cost", budget = 2000000L).count()
      println(f"[profile-budget] ANTI-CORR n=$n PRUNED one-shot " +
        f"${(System.nanoTime() - t0) / 1e9}%8.3f s ($rows rows, 0 retries by construction)")
      scored.unpersist()
    }
    // skewed-domain per-group leg: domain 'big' holds 90% of the rows
    for (n <- Seq(3000000L, 30000000L)) {
      val scored = spark.range(0L, n).select($"id".as("doc_id"),
          when(pmod($"id", lit(10)) < 9, "big").otherwise(concat(lit("s"),
            pmod($"id", lit(97)).cast("string"))).as("src"),
          pmod(conv(substring(md5(concat($"id".cast("string"), lit("#s"))),
            1, 8), 16, 10).cast("long"), lit(1000000L)).as("score_ppm"),
          lit(60L).as("cost"))
        .localCheckpoint()
      val budgets = scored.select($"src").distinct()
        .select($"src", lit(120000L).as("budget"))
      def timed(what: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(f"[profile-budget] BYGROUP n=$n%9d $what%-9s " +
          f"${(System.nanoTime() - t0) / 1e9}%8.3f s ($rows rows)")
      }
      timed("PRUNED") {
        graft.ops.Prep.selectUnderBudgetByGroupPruned(scored, "src",
          "doc_id", "score_ppm", "cost", budgets).count()
      }
      timed("PRUNED2") {
        graft.ops.Prep.selectUnderBudgetByGroupPruned(scored, "src",
          "doc_id", "score_ppm", "cost", budgets).count()
      }
      timed("WINDOW") {
        graft.ops.Prep.selectUnderBudgetByGroupBudgets(scored, "src",
          "doc_id", "score_ppm", "cost", budgets).count()
      }
      scored.unpersist()
    }
    // GATE-SCALE leg (VERDICT r16 Next #6): sf0.1-sized corpora with
    // a corpus-proportional budget — the regime where the pricing
    // pass's fixed cost dominates (q261 ran ~1.5x its r15 loop-form
    // time at sf0.1 while being 10.6x better at 30M). Neither skip
    // path fires here (the budget far exceeds any sample mass), so
    // the curve IS the honest fixed-cost story: exact wins below the
    // crossover, use it there.
    for (n <- Seq(30000L, 60000L, 120000L, 300000L)) {
      val scored = spark.range(0L, n).select($"id".as("doc_id"),
          pmod(conv(substring(md5(concat($"id".cast("string"), lit("#s"))),
            1, 8), 16, 10).cast("long"), lit(1000000L)).as("score_ppm"),
          lit(60L).as("cost"))
        .localCheckpoint()
      def timed(what: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(f"[profile-budget] GATESCALE n=$n%7d $what%-7s " +
          f"${(System.nanoTime() - t0) / 1e9}%8.3f s ($rows rows)")
      }
      timed("PRUNED") {
        graft.ops.Prep.selectUnderBudgetPruned(scored, "doc_id",
          "score_ppm", "cost", budget = n * 2L).count()
      }
      timed("EXACT") {
        graft.ops.Prep.selectUnderBudget(scored, "doc_id", "score_ppm",
          "cost", budget = n * 2L).count()
      }
      scored.unpersist()
    }
    // SKIP leg: a tiny budget the sample alone proves the finest rung
    // covers — the pricing scan is skipped (one corpus scan total),
    // result identical by the rung-identity argument in the scaladoc.
    {
      val n = 3000000L
      val scored = spark.range(0L, n).select($"id".as("doc_id"),
          pmod(conv(substring(md5(concat($"id".cast("string"), lit("#s"))),
            1, 8), 16, 10).cast("long"), lit(1000000L)).as("score_ppm"),
          lit(60L).as("cost"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val rows = graft.ops.Prep.selectUnderBudgetPruned(scored, "doc_id",
        "score_ppm", "cost", budget = 400L).count()
      println(f"[profile-budget] SKIP-FINEST n=$n PRUNED " +
        f"${(System.nanoTime() - t0) / 1e9}%8.3f s ($rows rows, pricing scan skipped)")
      scored.unpersist()
    }
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
