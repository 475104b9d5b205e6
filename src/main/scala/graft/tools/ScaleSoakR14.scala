package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 soak: per-batch cost of the set-state protocol IN STATE
  * DEPTH (VERDICT r13 Next #2's "Done" leg). The r13 PROFILE named
  * the honest asymptote of containmentBatch/setJaccardBatch: the df
  * pass window-counted state ∪ batch per batch, so per-batch cost
  * grew with the TOTAL state. The round-14 protocol sum-merges the
  * persisted (sh, df, first_doc) partials for the batch's shingles
  * only. This soak feeds EQUAL-SIZED document batches and times each
  * fold as the state deepens — the signal is the per-batch TREND:
  * flat-ish (residual growth is the unavoidable join-filtered scan of
  * the narrow df/inv/sets state files, not a full-state shuffle)
  * instead of the old linear-in-state window pass.
  *
  * Corpus: synthetic 40-token docs whose tokens embed the doc id
  * (shingles are unique to their doc except the planted 10% near-dup
  * rate, one copy per group of 10 differing in the last token) — so
  * candidate volume is planted-pair-bounded per batch and the
  * measured trend is PROTOCOL overhead in state depth, not corpus
  * pair growth.
  */
object ScaleSoakR14 {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def docs(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).as[Long].map { i =>
        val dup = i % 10 == 9
        val s = if (dup) (i / 10) * 10 else i
        val toks = (0 until 40).map { t =>
          if (dup && t == 39) s"w${s}x" else s"w${s}_$t"
        }
        (i, toks.mkString(" "))
      }.toDF("doc_id", "text")

    val base = java.nio.file.Files
      .createTempDirectory("soak_r14_state").toString
    val batchRows = 20000L
    val nBatches = 8
    println(s"[soak-r14] containment fold: $nBatches x $batchRows docs, " +
      "per-batch seconds as state deepens")
    (0 until nBatches).foreach { b =>
      val batch = docs(b * batchRows, (b + 1) * batchRows).localCheckpoint()
      val t0 = System.nanoTime()
      graft.streaming.StreamingUpsert.containmentBatch(spark, batch,
        "doc_id", "text", n = 3, tauPpm = 500000L, maxDf = 100L,
        basePath = base)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[soak-r14] batch $b%2d (state ${b * batchRows}%7d docs) $s%8.3f s")
    }
    val pairs = graft.streaming.StreamingUpsert
      .containmentPairsFromState(spark, base).count()
    println(s"[soak-r14] verified pairs in state: $pairs")

    // ---- 2. scd2StateBatch per-batch cost in HISTORY depth ----------
    // fixed 20k keys, one event per key per batch with alternating
    // states (every batch opens a new version for every key — the
    // worst case for closed-append volume). The open cursor set stays
    // key-sized, closed appends are delta-sized, so per-batch cost
    // should be flat as the history deepens.
    import org.apache.spark.sql.functions.{col, expr}
    val scd2Base = java.nio.file.Files
      .createTempDirectory("soak_r14_scd2").toString
    val nKeys = 20000L
    println(s"[soak-r14] scd2 fold: 10 batches x $nKeys keys, " +
      "per-batch seconds as history deepens")
    (0 until 10).foreach { b =>
      val batch = spark.range(0, nKeys)
        .select(col("id").as("k"),
          expr(s"timestamp_micros(1000000 * (1000 + $b * 60))").as("ts"),
          (col("id") * 100 + b).as("eid"),
          expr(s"CASE WHEN $b % 2 = 0 THEN 'A' ELSE 'B' END").as("v"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      graft.streaming.StreamingUpsert.scd2StateBatch(spark, batch,
        "k", "ts", "eid", "v", scd2Base, b.toLong)
      val s2 = (System.nanoTime() - t0) / 1e9
      println(f"[soak-r14] scd2 batch $b%2d (history ${b * nKeys}%7d closed rows) $s2%8.3f s")
    }
    val hist = graft.streaming.StreamingUpsert
      .scd2FromState(spark, scd2Base).count()
    println(s"[soak-r14] scd2 history rows: $hist")

    // ---- 3. decontaminationBatch per-batch cost in stream depth ----
    // fixed 2k-doc eval set (10% of it quotes train docs via shared
    // ids), 8 train batches of 20k docs — per-batch cost should be
    // flat: the only growing state is the per-shingle df chain.
    val evalSet = graft.ops.Dedup.shingleSets(
      docs(0, 2000).select(col("doc_id").as("test_id"), col("text")),
      "test_id", "text", 3)
      .select(col("doc_id").as("test_id"), col("shs"))
      .localCheckpoint()
    val dBase = java.nio.file.Files
      .createTempDirectory("soak_r14_decont").toString
    println("[soak-r14] decontamination fold: 8 x 20000 train docs vs " +
      "a fixed 2000-doc eval set")
    (0 until 8).foreach { b =>
      val batch = docs(b * batchRows, (b + 1) * batchRows).localCheckpoint()
      val t0 = System.nanoTime()
      graft.streaming.StreamingUpsert.decontaminationBatch(spark, batch,
        "doc_id", "text", evalSet, n = 3, tauPpm = 500000L,
        maxDf = 100L, basePath = dBase, batchId = b.toLong)
      val s3 = (System.nanoTime() - t0) / 1e9
      println(f"[soak-r14] decont batch $b%2d (df chain after ${b * batchRows}%7d docs) $s3%8.3f s")
    }
    val np = graft.streaming.StreamingUpsert
      .decontaminationPairsFromState(spark, dBase).count()
    println(s"[soak-r14] contamination pairs found: $np")
    spark.stop()
  }
}
