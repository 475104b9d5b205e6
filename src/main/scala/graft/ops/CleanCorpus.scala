package graft
package ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline (the C4/RefinedWeb
  * shape): language filter → quality filter → exact dedup → near-dup
  * cluster resolution, all from this library's verified pieces.
  *
  * One linear annotate+filter pass, one content-hash aggregate, one
  * minhash-LSH candidate stage, one component resolution — no step is
  * quadratic in the corpus, and every step is an operator with its own
  * oracle-checked query, so the composition inherits their semantics.
  */
object CleanCorpus {

  /** Returns the cleaned corpus: input columns + lang_pred + quality,
    * keeping only docs that (1) predict into `langs` with quality >=
    * minQuality, (2) are the min-id keeper of their exact-content
    * group, and (3) are the min-id keeper of their near-dup cluster
    * (minhash-LSH pairs at `tau`).
    *
    * NOT a lazy builder: cluster resolution is an iterative fixpoint,
    * so calling this runs Spark jobs (unlike every other builder in
    * this library). Call it where an action is acceptable.
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            langs: Seq[String], minQuality: Double,
            n: Int, bands: Int, rowsPerBand: Int, tau: Double,
            maxBucket: Long = Dedup.defaultMaxBucket,
            mat: Materializer = Materialize.Local): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)
    // Materialization barrier: this function executes jobs anyway (see
    // below), and `filtered` / `exact` are each scanned several times
    // (keeper agg, verify joins, final anti-join) — without a barrier
    // every scan would re-run the full langId/quality expression tree
    // over the source. The mechanism is the caller's Materializer.
    val filtered = mat(docs
      .withColumn("_st", TextAnalysis.textStats(TextAnalysis.toks(text)))
      .withColumn("lang_pred", TextAnalysis.langIdFromStats(col("_st.hits")))
      .withColumn("quality",
        TextAnalysis.qualityScoreFromStats(text, col("_st")))
      .filter(col("lang_pred").isin(langs: _*) &&
        col("quality") >= minQuality)
      .drop("_st"))
    val keep = filtered.groupBy(md5(text).as("_ck"))
      .agg(min(id).as("_keeper"))
    val exact = mat(filtered
      .join(keep, md5(text) === col("_ck") && id === col("_keeper"))
      .drop("_ck", "_keeper"))
    // exact dedup ran FIRST, so identical-content cohorts never reach
    // the LSH band buckets — maxBucket then only drops true near-dup
    // pile-ups (the documented recall trade, see minhashLshPairs).
    val pairs = Dedup.minhashLshPairs(exact, idCol, textCol,
      n, bands, rowsPerBand, tau, maxBucket, mat)
    val drops = Dedup.duplicateClusters(pairs, mat)
      .filter(!col("is_keeper"))
      .select(col("doc_id").as("_drop"))
    exact.join(drops, id === col("_drop"), "left_anti")
  }
}
