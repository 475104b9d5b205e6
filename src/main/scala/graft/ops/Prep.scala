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
}
