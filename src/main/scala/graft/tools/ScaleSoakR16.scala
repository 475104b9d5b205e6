package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 soak: the MAINTAINED curation capstone's per-stage state
  * folds in STATE DEPTH (the q269 soak leg, VERDICT r15 Next #1) —
  * fixed-size batches, per-batch seconds as the states deepen.
  *
  *   1. clfCountsBatch — reads ONE classes×vocabulary predecessor
  *      version per batch, so per-batch cost must stay FLAT in batch
  *      count (lmCountsBatch's proven shape, ScaleSoakR15 leg 4).
  *   2. The capstone dedup fold (nearDupBatch + the clusterStateBatch
  *      pair-union fold) — the state tables it reads (sets / buckets
  *      / pairs / labels) grow with accumulated CONTENT, not batch
  *      count, so the expected trend is a shallow linear in the
  *      accumulated corpus (state reads), never super-linear; 10% of
  *      each batch duplicates a PREVIOUS batch's text so the pair
  *      and label states genuinely grow across the run.
  *
  * Together with ScaleSoakR15 leg 4 (LM counts flat), these are the
  * three state folds q269 composes.
  */
object ScaleSoakR16 {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val su = graft.streaming.StreamingUpsert
    val batchRows = 20000L

    def docs(b: Int): DataFrame =
      spark.range(b * batchRows, (b + 1) * batchRows).as[Long].map { i =>
        // every 10th doc repeats a doc from the PREVIOUS batch —
        // cross-batch exact dups, so pairs/labels accumulate. Every
        // token position hashes (base, t) independently: each doc is
        // a random 40-token draw over the 4000-token vocabulary, so
        // distinct docs never collide (the first cut's linear
        // (base + t*stride) % 4000 had only 28000 possible sequences
        // — every doc 28000 ids apart was an accidental exact dup
        // and the label table went corpus-sized; the planted 10%
        // must be the only systematic duplicates) while the
        // vocabulary — and with it the clf count state — stays
        // bounded.
        // copies resolve to the BATCH-0 original (i % batchRows, not
        // i - batchRows: the previous batch's id at that offset is
        // itself a copy whose text hashes from ITS base, so a
        // minus-one-batch rule only ever duplicated batch 0 into
        // batch 1 and the pair state stopped growing after batch 1)
        val base = if (i % 10 == 9 && i >= batchRows) i % batchRows else i
        val toks = (0 until 40).map { t =>
          val h = scala.util.hashing.MurmurHash3
            .stringHash(s"$base#$t") & Int.MaxValue
          s"w${h % 4000}"
        }
        (i, toks.mkString(" "))
      }.toDF("doc_id", "text").localCheckpoint()

    val clfBase = java.nio.file.Files
      .createTempDirectory("soak_r16_clf_state").toString
    val dedupBase = java.nio.file.Files
      .createTempDirectory("soak_r16_dedup_state").toString
    val clusterBase = java.nio.file.Files
      .createTempDirectory("soak_r16_cluster_state").toString
    println(s"[soak-r16] capstone state folds: 8 x $batchRows docs, " +
      "per-batch seconds as every state deepens")
    (0 until 8).foreach { b =>
      val d = docs(b)
      val labeled = d.withColumn("label",
        when(pmod($"doc_id", lit(2)) === 0, "clean").otherwise("spam"))
      var t0 = System.nanoTime()
      su.clfCountsBatch(spark, labeled, "doc_id", "label", "text",
        clfBase, b.toLong)
      val tClf = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      su.nearDupBatch(spark, d, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 2, tau = 0.5, dedupBase)
      su.clusterStateBatch(spark,
        spark.read.parquet(s"$dedupBase/pairs")
          .select($"doc_a", $"doc_b").distinct(),
        clusterBase, b.toLong)
      val tDedup = (System.nanoTime() - t0) / 1e9
      println(f"[soak-r16] batch $b%2d (state ${b * batchRows}%7d docs) " +
        f"clf $tClf%7.3f s   dedup-fold $tDedup%7.3f s")
      d.unpersist()
    }
    val (w, _) = su.clfModelFromState(spark, clfBase)
    val labels = su.clustersFromState(spark, clusterBase)
    println(s"[soak-r16] final state: weights=${w.count()}, " +
      s"cluster labels=${labels.count()}")
    spark.stop()
  }
}
