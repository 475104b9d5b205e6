package graft
package ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis.toks

/** Training-prep operators: sequence packing and sliding-window
  * chunking — the last-mile steps between a cleaned corpus and a
  * training/RAG pipeline.
  */
object Prep {

  /** Pack documents into token-budget bins, per shard: documents are
    * sharded by id, ordered within the shard, and assigned
    * bin = floor((cumulative_tokens - 1) / budget). This is the
    * scalable deterministic packing: each shard packs independently
    * (the window never crosses shards, so no global sort), at the cost
    * of bins never spanning shards. Oversized documents (> budget
    * tokens) straddle bins — the standard cumulative approximation;
    * exact first-fit is inherently sequential.
    *
    * Output: (id, n_tokens, shard, bin_id).
    */
  def packBins(docs: DataFrame, idCol: String, textCol: String,
               budgetTokens: Long, numShards: Int): DataFrame = {
    require(budgetTokens > 0 && numShards > 0)
    val w = Window.partitionBy($"shard")
      .orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
        pmod(col(idCol), lit(numShards)).cast("long").as("shard"))
      .withColumn("cum", sum($"n_tokens").over(w))
      // greatest(.,1): an all-empty prefix (cum=0) stays in bin 0 in
      // both truncating and flooring integer division. DIV keeps the
      // arithmetic in exact int64 — Column./ is double division, which
      // mis-bins once a shard's cumulative count passes 2^53.
      .withColumn("_c", greatest($"cum", lit(1L)) - 1)
      .select(col(idCol), $"n_tokens", $"shard",
        expr(s"_c DIV $budgetTokens").as("bin_id"))
  }

  /** Sliding-window chunking: one row per (doc, chunk), chunks of
    * `chunkSize` tokens starting every `stride` tokens (the RAG /
    * long-context prep shape). The row-multiplying posexplode is a
    * Generate — no shuffle; empty documents produce no chunks.
    *
    * Output: (id, chunk_idx 0-based, n_chunk_tokens, chunk_fp).
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0)
    val t = toks(col(textCol))
    docs.select(col(idCol), t.as("toks"))
      .filter(size($"toks") > 0)
      .select(col(idCol), $"toks",
        posexplode(sequence(lit(1), size($"toks"), lit(stride))))
      .select(col(idCol),
        $"pos".cast("long").as("chunk_idx"),
        slice($"toks", $"col", lit(chunkSize)).as("chunk"))
      .select(col(idCol), $"chunk_idx",
        size($"chunk").cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", $"chunk")).as("chunk_fp"))
  }

  /** Packed training sequences — the LAST mile after tokenization:
    * encoded documents (doc_id, ids — [[TextAnalysis.encodeDocs]]'
    * output) shard by id, pack by cumulative id count
    * ([[packBins]]' bin rule with n = size(ids) + 1 for the
    * document-boundary token), and each (shard, bin) assembles its
    * documents' id runs in doc_id order with `eosId` appended after
    * EVERY document — the GPT-style doc-separator convention that
    * lets attention masking recover document boundaries. Token-less
    * documents are dropped (nothing to train on). Oversized
    * documents straddle bins exactly as [[packBins]] documents
    * (whole-doc assignment by cumulative end; exact first-fit is
    * inherently sequential). Output per (shard, bin_id): n_docs,
    * n_ids, and the md5 fingerprint of the space-joined packed ids —
    * the q155 fingerprint discipline, because the packed sequence
    * itself is budget-sized.
    *
    * Scale shape: ONE shard-partitioned cumulative window (no global
    * sort — shards pack independently) + one (shard, bin) aggregate;
    * in-bin ordering is an array_sort over the bin's own structs
    * (budget-bounded), never a corpus sort.
    */
  def packSequences(encoded: DataFrame, budgetTokens: Long,
                    numShards: Int, eosId: Long): DataFrame = {
    require(budgetTokens > 0 && numShards > 0)
    val w = Window.partitionBy($"shard")
      .orderBy($"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    encoded.select($"doc_id", $"ids")
      .filter(size($"ids") > 0)
      .withColumn("shard", pmod($"doc_id", lit(numShards)).cast("long"))
      .withColumn("_n", size($"ids").cast("long") + 1L)
      .withColumn("_c", sum($"_n").over(w) - 1)
      .withColumn("bin_id", expr(s"_c DIV $budgetTokens"))
      .groupBy($"shard", $"bin_id")
      .agg(array_sort(collect_list(struct($"doc_id", $"ids"))).as("_s"))
      .select($"shard", $"bin_id",
        size($"_s").cast("long").as("n_docs"),
        flatten(transform($"_s",
          s => concat(s.getField("ids"), array(lit(eosId))))).as("_ids"))
      .select($"shard", $"bin_id", $"n_docs",
        size($"_ids").cast("long").as("n_ids"),
        md5(concat_ws(" ",
          transform($"_ids", _.cast("string")))).as("ids_fp"))
  }

  /** Leakage-safe train/test split: the split decision is made per
    * duplicate CLUSTER, not per document, so near-duplicates can never
    * straddle the boundary (the eval-contamination failure mode of a
    * naive per-row split: the test set silently contains paraphrases
    * of training rows and eval scores inflate). `clusters` is a
    * [[Dedup.duplicateClusters]]-shaped frame (doc_id, cluster_id);
    * documents outside any near-dup pair are their own singleton
    * cluster. A cluster lands in test iff its md5 per-million bucket
    * ([[Sessions.ppmBucket]] — engine-portable, nests with every
    * other sampler) falls below `testPpm`.
    *
    * Scale shape: the cluster table is pair-derived (dup-involved docs
    * only — a sliver of the corpus), so the left join broadcasts it or
    * shuffles only the sliver under AQE; the bucket decision is one
    * codegen'd md5 over the resolved cluster id — no second pass, no
    * per-cluster aggregate.
    *
    * Output: (idCol, cluster_id, split 'train'|'test').
    */
  def clusterSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
                   testPpm: Long): DataFrame = {
    require(testPpm >= 0 && testPpm <= 1000000,
      s"testPpm must be in [0, 1000000], got $testPpm")
    docs.select(col(idCol))
      .join(clusters.select(col("doc_id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("split",
        when(Sessions.ppmBucket(col("cluster_id")) < testPpm, "test")
          .otherwise("train"))
  }
}
