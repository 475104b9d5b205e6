package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 soak: the three new shapes at 1x/3x/10x.
  *
  *   1. DEFERRED vs PER-BATCH cluster folds as the batch count grows
  *      (VERDICT r16 Next #3): the pair-state maintenance is paid
  *      either way; the per-batch mode pays B full pair-union folds,
  *      the deferred mode exactly one — the saving must GROW with B
  *      and the final labels must be identical (the
  *      StreamingUpsertSpec property at soak scale).
  *   2. EPOCH selection (selectUnderBudgetByGroupEpochs): the
  *      repetition explode is output-proportional (at most one
  *      whole-corpus pass beyond what the selection keeps), so
  *      wall-clock must scale ~linearly in the corpus while a
  *      planted tiny source repeats for 5+ epochs.
  *   3. ENSEMBLE bucketing (Ensemble.bucketEdges + bucketize +
  *      maxGate): one bounded sketch per scorer + a map-only fold
  *      over the 9-edge literal — linear scans, no joins beyond the
  *      scorer join, no windows.
  */
object ScaleSoakR17 {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val su = graft.streaming.StreamingUpsert

    // ---- leg 1: deferred vs per-batch folds in batch count --------
    val batchRows = 20000L
    def docs(b: Int): DataFrame =
      spark.range(b * batchRows, (b + 1) * batchRows).as[Long].map { i =>
        // the r16 generator verbatim (every token position hashed
        // independently; planted dups resolve to the batch-0
        // original — see ScaleSoakR16 for why both matter)
        val base = if (i % 10 == 9 && i >= batchRows) i % batchRows else i
        val toks = (0 until 40).map { t =>
          val h = scala.util.hashing.MurmurHash3
            .stringHash(s"$base#$t") & Int.MaxValue
          s"w${h % 4000}"
        }
        (i, toks.mkString(" "))
      }.toDF("doc_id", "text").localCheckpoint()
    for (nBatches <- Seq(4, 8)) {
      val pairsBase = java.nio.file.Files
        .createTempDirectory(s"soak_r17_pairs_$nBatches").toString
      val perBase = java.nio.file.Files
        .createTempDirectory(s"soak_r17_per_$nBatches").toString
      val defBase = java.nio.file.Files
        .createTempDirectory(s"soak_r17_def_$nBatches").toString
      var perSec = 0.0
      (0 until nBatches).foreach { b =>
        su.nearDupBatch(spark, docs(b), "doc_id", "text",
          n = 3, bands = 4, rowsPerBand = 2, tau = 0.5, pairsBase)
        val t0 = System.nanoTime()
        su.clusterFoldFromPairs(spark, pairsBase, perBase, b.toLong)
        perSec += (System.nanoTime() - t0) / 1e9
      }
      val t0 = System.nanoTime()
      su.clusterFoldFromPairs(spark, pairsBase, defBase, 0L)
      val defSec = (System.nanoTime() - t0) / 1e9
      val same = su.clustersFromState(spark, perBase)
        .except(su.clustersFromState(spark, defBase)).isEmpty &&
        su.clustersFromState(spark, defBase)
          .except(su.clustersFromState(spark, perBase)).isEmpty
      println(f"[soak-r17] FOLDS B=$nBatches%2d per-batch total " +
        f"$perSec%7.2f s vs deferred ONE $defSec%6.2f s " +
        f"(labels identical: $same)")
      require(same, "deferred fold diverged from per-batch folds")
    }

    // ---- leg 2: epoch selection at 1x/3x/10x -----------------------
    for (n <- Seq(1000000L, 3000000L, 10000000L)) {
      // 19 big sources + one tiny planted source that must repeat
      val scored = spark.range(0L, n).select($"id".as("doc_id"),
          when(pmod($"id", lit(1000)) === 0, "tiny")
            .otherwise(concat(lit("s"), pmod($"id", lit(19)).cast("string")))
            .as("src"),
          pmod(conv(substring(md5(concat($"id".cast("string"), lit("#e"))),
            1, 8), 16, 10).cast("long"), lit(1000000L)).as("score_ppm"),
          lit(25L).as("cost"))
        .localCheckpoint()
      // budgets: big sources take a prefix (epochs 1); the tiny
      // source's budget is 5x its mass (epochs 5 — the over-mass path)
      val tinyMass = n / 1000L * 25L
      val budgets = scored.select($"src").distinct()
        .select($"src",
          when($"src" === "tiny", lit(5L) * tinyMass)
            .otherwise(lit(n / 19L)).as("budget"),
          when($"src" === "tiny", 5L).otherwise(1L).as("epochs"))
      val t0 = System.nanoTime()
      val out = graft.ops.Prep.selectUnderBudgetByGroupEpochs(scored,
        "src", "doc_id", "score_ppm", "cost", budgets)
      val rows = out.count()
      val maxEp = out.agg(max($"epoch")).head().getLong(0)
      println(f"[soak-r17] EPOCHS n=$n%9d " +
        f"${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        f"($rows rows, max epoch $maxEp)")
      scored.unpersist()
    }

    // ---- leg 3: ensemble bucketing at 1x/3x/10x --------------------
    for (n <- Seq(3000000L, 10000000L, 30000000L)) {
      val sA = spark.range(0L, n).select($"id".as("doc_id"),
          pmod(conv(substring(md5(concat($"id".cast("string"), lit("#a"))),
            1, 8), 16, 10).cast("long"), lit(1000000L)).as("margin_ppb"))
        .localCheckpoint()
      val sB = spark.range(0L, n).select($"id".as("doc_id"),
          pmod(conv(substring(md5(concat($"id".cast("string"), lit("#b"))),
            1, 8), 16, 10).cast("long"), lit(1000000L)).as("fluency_ppm"))
        .localCheckpoint()
      val ens = graft.ops.Ensemble
      // the two halves timed apart: edge DERIVATION is two bottom-k
      // window sorts over the full frame (the sketch's inherent cost
      // — served from the maintained sketch asset at 100 TB), the
      // GATE is the scorer join + map-only bucket folds
      var t0 = System.nanoTime()
      val eA = ens.bucketEdges(sA, "doc_id", "margin_ppb", 10)
      val eB = ens.bucketEdges(sB, "doc_id", "fluency_ppm", 10)
      val sketchSec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val kept = ens.maxGate(
          ens.bucketize(
            ens.bucketize(sA.join(sB, Seq("doc_id")),
              "margin_ppb", eA, "b_margin"),
            "fluency_ppm", eB, "b_fluency"),
          Seq("b_margin", "b_fluency"), minBucket = 5L)
        .filter(col("kept")).count()
      println(f"[soak-r17] ENSEMBLE n=$n%9d sketch $sketchSec%6.2f s " +
        f"gate ${(System.nanoTime() - t0) / 1e9}%6.2f s ($kept kept)")
      sA.unpersist(); sB.unpersist()
    }
    spark.stop()
  }
}
