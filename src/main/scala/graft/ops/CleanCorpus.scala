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
            mat: Materializer = Materialize.LocalLazy): DataFrame = {
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

  /** ONE near-dup decision over a MIXED binary corpus — the
    * cross-modality capstone: blobs route by magic sniff
    * ([[Multimodal.sniffFormat]]) to their modality's fingerprint
    * chain, and the four pair sets union into one
    * connected-components cluster table:
    *
    *  - GIF → per-frame dHash frame-set Jaccard
    *    ([[Media.dhashGifFrames]] → [[Dedup.setJaccardPairs]]);
    *  - PNG / JPEG → perceptual dHash banded Hamming
    *    ([[Media.dhashImages]] → [[Dedup.hammingPairs]]);
    *  - RIFF → PCM energy-envelope banded Hamming
    *    ([[Media.energyHashWav]] — non-WAV RIFF fails the contract
    *    closed);
    *  - everything else that IS valid UTF-8 (text cannot start with
    *    the PNG/JPEG magic bytes; a textual PDF/MP3-with-ID3-comment
    *    routes here and simply tokenizes as text) → SimHash banded
    *    Hamming ([[Dedup.simhashFingerprints]]);
    *  - everything else — bytes with no recognized magic that are
    *    NOT valid UTF-8 — routes to `unknown` and is EXCLUDED
    *    (fail-closed, the Media decoders' discipline; VERDICT r13
    *    Next #5). Before this route, a corrupt binary silently
    *    simhashed as mojibake text — two identical corrupt blobs
    *    would cluster as "near-dup documents" nobody can read.
    *
    * The union is EXACT, not heuristic: fingerprints live in disjoint
    * spaces, so pairs can only form WITHIN a modality, and each chain
    * keeps its own blocking discipline (banded Hamming pigeonhole /
    * df-capped inverted frame-hash index). Like [[clean]], cluster
    * resolution is an iterative fixpoint — calling this runs jobs.
    *
    * Scale shape: the sniffed corpus is sealed ONCE behind the
    * Materializer (four modality filters scan the barrier, not the
    * source); every chain then keeps the scale shape its own gate
    * entry pins (map-only fingerprints, banded/capped candidate
    * joins, CC over pairs only).
    */
  /** Quality-argmax duplicate resolution: keep the BEST document of
    * every near-dup cluster instead of the smallest-id one — what
    * production dedup actually does (RefinedWeb/Dolma keep the
    * longest / highest-quality duplicate, not an arrival-order
    * accident). `scored` carries one row per corpus document with a
    * deterministic `scoreCol`; `clusters` is a
    * [[Dedup.duplicateClusters]]-shaped (doc_id, cluster_id) table
    * covering only dup-involved docs — singletons resolve to their
    * own id. Keeper = (score desc, id asc) argmax within the cluster.
    *
    * Scale shape: the cluster table is pair-derived (a sliver of the
    * corpus), so the left join broadcasts it or shuffles the sliver
    * under AQE; the rank window partitions by cluster_id — parallel,
    * cluster-sized sorts (almost all singletons), never a global
    * sort. Output: `scored`'s columns + cluster_id, keepers only.
    */
  def keepBestInCluster(scored: DataFrame, idCol: String,
                        scoreCol: String,
                        clusters: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    scored
      .join(clusters.select(col("doc_id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  def multimodalNearDupClusters(corpus: DataFrame,
                                textMaxDist: Int = 3,
                                imageMaxDist: Int = 6,
                                audioMaxDist: Int = 6,
                                videoTauPpm: Long = 500000L,
                                videoMaxDf: Long = 10L,
                                maxFrames: Int = 8,
                                mat: Materializer = Materialize.LocalLazy)
      : DataFrame = {
    val c = mat(corpus.select(col("doc_id"), col("bin"),
      Multimodal.sniffFormat(col("bin")).as("_fmt")))
    def pairsOf(df: DataFrame) = df.select(col("doc_a"), col("doc_b"))
    val text = pairsOf(Dedup.hammingPairs(
      Dedup.simhashFingerprints(textRoute(c), "doc_id", "text"),
      textMaxDist, mat = mat))
    val image = pairsOf(Dedup.hammingPairs(
      Media.dhashImages(c.filter(col("_fmt").isin("png", "jpeg")),
          "doc_id", "bin")
        .filter(col("ok"))
        .select(col("id").as("doc_id"), col("dhash").as("fp")),
      imageMaxDist, mat = mat))
    val audio = pairsOf(Dedup.hammingPairs(
      Media.energyHashWav(c.filter(col("_fmt") === "riff"),
          "doc_id", "bin")
        .filter(col("ok"))
        .select(col("id").as("doc_id"), col("fp")),
      audioMaxDist, mat = mat))
    val video = pairsOf(Dedup.setJaccardPairs(
      Media.dhashGifFrames(c.filter(col("_fmt") === "gif"),
          "doc_id", "bin", maxFrames)
        .groupBy(col("id").as("doc_id"))
        .agg(collect_set(col("dhash")).as("shs")),
      videoTauPpm, videoMaxDf, mat))
    Dedup.duplicateClusters(
      text.unionByName(image).unionByName(audio).unionByName(video), mat)
  }

  /** THE text route of the cross-modality routing contract — shared
    * by the batch capstone, the maintained fold
    * ([[graft.streaming.StreamingUpsert.multimodalNearDupBatch]]) and
    * the profiler, so the rule can never drift between them (round-14
    * review finding: this round's fail-closed change had to land in
    * three copies in lockstep). Input: a sniffed (doc_id, bin, _fmt)
    * frame; output: (doc_id, text) for exactly the blobs that belong
    * to the text chain — no recognized media magic AND valid UTF-8
    * (the binary→string cast is zero-copy in Spark, no validation, so
    * is_valid_utf8 genuinely detects corrupt bytes; invalid blobs
    * fail closed out of every chain).
    */
  private[graft] def textRoute(sniffed: DataFrame): DataFrame =
    sniffed
      .filter(!col("_fmt").isin("gif", "png", "jpeg", "riff") &&
        is_valid_utf8(col("bin").cast("string")))
      .select(col("doc_id"), col("bin").cast("string").as("text"))
}
