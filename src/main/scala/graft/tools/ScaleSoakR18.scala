package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Round-18 soak: the two measurement gaps VERDICT r17 named.
  *
  *   1. MAINTAINED EDGES at 30M (VERDICT r17 Next #6): ScaleSoakR17
  *      measured the ensemble edge-derivation cliff (two full-frame
  *      bottom-k sorts, ~40 s at 30M vs ~12 s for the gate) and the
  *      claim that the maintained faces (q288/q289) answer it was a
  *      design argument. This leg MEASURES it: per-ingest-segment
  *      sketch partials persist as a parquet asset (each segment
  *      sketched ONCE, at ingest), and serve-time edge derivation
  *      reads segments×k rows — it must stay FLAT across 3M → 30M
  *      while the one-shot derivation climbs, with the edges
  *      REQUIREd identical (the quantileMerge bit-equality law).
  *   2. WHITESPACE-cost vs BPE-cost budget selection at sf0.1
  *      (VERDICT r17 Next #2): q293 prices the budget in tokenizer
  *      tokens; the delta vs the whitespace pricing is exactly the
  *      segmentation pass (the merge-table asset is prebuilt — the
  *      q202 serve discipline), measured here so PROFILE carries a
  *      number instead of an assertion.
  */
object ScaleSoakR18 {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ens = graft.ops.Ensemble
    val sk = graft.ops.Sketches

    // ---- leg 1: one-shot vs maintained-asset edge derivation ------
    // untimed warmup (the ScaleSoakLayout discipline): JIT + codegen
    // for the sketch/window shapes, so the 3M point doesn't read
    // slower than 10M
    ens.bucketEdges(spark.range(0L, 500000L).select($"id".as("doc_id"),
      pmod(conv(substring(md5(concat($"id".cast("string"), lit("#w"))),
        1, 8), 16, 10).cast("long"), lit(1000000L)).as("margin_ppb")),
      "doc_id", "margin_ppb", 10)
    val nSegs = 10
    for (n <- Seq(3000000L, 10000000L, 30000000L)) {
      val scored = spark.range(0L, n).select($"id".as("doc_id"),
          pmod(conv(substring(md5(concat($"id".cast("string"), lit("#a"))),
            1, 8), 16, 10).cast("long"), lit(1000000L)).as("margin_ppb"))
        .localCheckpoint()
      // one-shot: the full-frame bottom-k sort (the r17 cliff)
      var t0 = System.nanoTime()
      val oneShot = ens.bucketEdges(scored, "doc_id", "margin_ppb", 10)
      val oneSec = (System.nanoTime() - t0) / 1e9
      // ingest: each mod-nSegs segment sketched once, partial appended
      // to the asset — the cost a maintained pipeline pays as data
      // arrives, never again
      val asset = java.nio.file.Files
        .createTempDirectory(s"soak_r18_edges_$n").toString + "/partials"
      t0 = System.nanoTime()
      (0 until nSegs).foreach { i =>
        sk.quantilePartials(
            scored.filter(pmod($"doc_id", lit(nSegs)) === i),
            Nil, $"doc_id", $"margin_ppb", 512)
          .write.mode("append").parquet(asset)
      }
      val ingestSec = (System.nanoTime() - t0) / 1e9
      // serve: read the asset (nSegs×k rows), merge, estimate — the
      // history is never re-sorted
      t0 = System.nanoTime()
      val served = ens.bucketEdgesFromPartials(
        spark.read.parquet(asset), 10)
      val serveSec = (System.nanoTime() - t0) / 1e9
      require(served.toSeq == oneShot.toSeq,
        s"served edges diverged from one-shot at n=$n")
      println(f"[soak-r18] EDGES n=$n%9d one-shot $oneSec%6.2f s | " +
        f"ingest($nSegs segs) $ingestSec%6.2f s serve $serveSec%6.2f s " +
        "(edges identical)")
      scored.unpersist()
    }

    // ---- leg 2: whitespace-cost vs BPE-cost selection at sf0.1 ----
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").localCheckpoint()
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 10)
    merges.cache().count() // the q202 asset — prebuilt, untimed
    val tk = TextAnalysis.toks($"text")
    val scoreCol = when(size(tk) === 0, 0L)
      .otherwise(graft.functions.Fns.exactPpm(
        size(array_distinct(tk)).cast("long"), size(tk).cast("long")))
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"[soak-r18] BUDGET $name%-16s min ${ts.map(_._1).min}%6.2f s " +
        f"(${ts.head._2} rows; runs ${ts.map(t => f"${t._1}%.2f").mkString(",")})")
    }
    time("whitespace-cost") {
      graft.ops.Prep.selectUnderBudgetPruned(
        docs.select($"doc_id", scoreCol.as("score_ppm"),
          greatest(size(tk), lit(1)).cast("long").as("cost")),
        "doc_id", "score_ppm", "cost", budget = 15000L).count()
    }
    time("bpe-cost") {
      val seg = TextAnalysis.bpeSegment(docs, "doc_id", "text", merges,
          native = true)
        .select($"doc_id", size($"syms").cast("long").as("n_bpe"))
      graft.ops.Prep.selectUnderBudgetPruned(
        docs.select($"doc_id", scoreCol.as("score_ppm"))
          .join(seg, Seq("doc_id"))
          .select($"doc_id", $"score_ppm",
            greatest($"n_bpe", lit(1L)).as("cost")),
        "doc_id", "score_ppm", "cost", budget = 15000L).count()
    }
    spark.stop()
  }
}
