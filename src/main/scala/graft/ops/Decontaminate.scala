package graft
package ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus decontamination — the benchmark-leakage check every
  * LLM training pipeline runs before training (the GPT-3 appendix-C /
  * PaLM / Llama eval-overlap discipline): find TRAINING documents
  * that share n-gram content with an EVALUATION set, and drop them.
  * This is [[Dedup.containmentPairs]]' machinery with the candidate
  * join made BIPARTITE: only train×test pairs form (never train×train
  * or test×test — the within-corpus decision is the dedup family's
  * job), so the blocking cost of a shingle is df_train × df_test.
  *
  * Two decision rules, both industry-standard:
  *  - [[contaminationPairs]] — the containment rule: a test doc is
  *    contaminated IN a train doc when ≥ tauPpm of the TEST doc's
  *    shingles appear in it (asymmetric by design: the test doc is
  *    the thing being leaked; a giant train doc quoting it whole must
  *    score 10⁶ even though the quote is a sliver of the train side).
  *  - [[sharedNgramPairs]] — the any-overlap rule (GPT-3's 13-gram
  *    filter): EVERY train×test pair sharing at least one rare
  *    n-gram, with the exact shared count attached.
  *
  * Same documented df-cap trade as the dedup family: pairs sharing
  * ONLY hot shingles (df over the UNION > maxDf) are missed — one
  * boilerplate phrase must not go O(df²). Scores in exact integer ppm.
  *
  * Scale shape: two map-only shingle passes, one union-df aggregate,
  * one bipartite equi-join on the rare shingle, ONE exact
  * array_intersect per candidate — nothing all-pairs, and the test
  * side (eval sets are small) typically broadcasts into the join.
  */
object Decontaminate {

  /** The shared bipartite candidate+verify chain: raw
    * (train_id, test_id, inter, na, nb) for every train×test pair
    * sharing ≥ 1 rare shingle. na = train-doc shingles, nb = test-doc
    * shingles.
    */
  private def crossPairsRaw(train: DataFrame, trainId: String,
                            trainText: String, test: DataFrame,
                            testId: String, testText: String, n: Int,
                            maxDf: Long,
                            mat: Materializer): DataFrame =
    crossPairsRawFromSets(train, trainId, trainText,
      Dedup.shingleSets(test, testId, testText, n)
        .select($"doc_id".as("test_id"), $"shs"),
      n, maxDf, mat)

  /** [[crossPairsRaw]] over PRE-SHINGLED test sets (test_id, shs) —
    * the eval suite is frozen in production, so its shingle sets are
    * computed once and served as a versioned asset (q298) or fed to
    * the streaming protocol
    * ([[graft.streaming.StreamingUpsert.decontaminationBatch]] takes
    * the same shape). Shingling the test corpus here and passing the
    * result is exactly [[crossPairsRaw]]. CONTRACT: `shs` elements
    * are DISTINCT per row — [[Dedup.shingleSets]]' output satisfies
    * it; the public asset entry point normalizes defensively
    * (round-18 review: normalizing HERE taxed every inline call with
    * a redundant array_distinct pass).
    */
  private def crossPairsRawFromSets(train: DataFrame, trainId: String,
                                    trainText: String,
                                    testSets: DataFrame, n: Int,
                                    maxDf: Long,
                                    mat: Materializer): DataFrame = {
    require(maxDf >= 1L, s"maxDf must be >= 1, got $maxDf")
    val ta = mat(Dedup.shingleSets(train, trainId, trainText, n)
      .filter(size($"shs") > 0))
    val tb = mat(testSets
      .select($"test_id".as("doc_id"), $"shs")
      .filter(size($"shs") > 0))
    val invA = ta.select($"doc_id".as("train_id"), explode($"shs").as("sh"))
    val invB = tb.select($"doc_id".as("test_id"), explode($"shs").as("sh"))
    // the cap is over the UNION df: a shingle's bipartite blocking
    // cost is df_train × df_test <= (df_train + df_test)² / 4
    val rare = mat(invA.select($"sh").unionAll(invB.select($"sh"))
      .groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" <= maxDf).select($"sh"))
    val cands = invA.join(rare, Seq("sh"), "left_semi")
      .join(invB.join(rare, Seq("sh"), "left_semi"), Seq("sh"))
      .select($"train_id", $"test_id").distinct()
    cands
      .join(ta.select($"doc_id".as("train_id"), $"shs".as("_sa")),
        Seq("train_id"))
      .join(tb.select($"doc_id".as("test_id"), $"shs".as("_sb")),
        Seq("test_id"))
      .select($"train_id", $"test_id",
        size(array_intersect($"_sa", $"_sb")).cast("long").as("inter"),
        size($"_sa").cast("long").as("na"),
        size($"_sb").cast("long").as("nb"))
  }

  /** Containment-rule contamination pairs — see the object scaladoc.
    * Returns (train_id, test_id, inter, na, nb, cont_test_ppm),
    * cont_test_ppm = inter × 10⁶ DIV nb ≥ tauPpm.
    */
  def contaminationPairs(train: DataFrame, trainId: String,
                         trainText: String, test: DataFrame,
                         testId: String, testText: String, n: Int,
                         tauPpm: Long, maxDf: Long = 1000L,
                         mat: Materializer = Materialize.LocalLazy): DataFrame =
    contaminationPairsFromSets(train, trainId, trainText,
      Dedup.shingleSets(test, testId, testText, n)
        .select($"doc_id".as("test_id"), $"shs"),
      n, tauPpm, maxDf, mat)

  /** [[contaminationPairs]] over PRE-SHINGLED eval sets
    * (test_id, shs) — the serve form: the eval suite is frozen, so
    * its shingle sets persist as a versioned asset and every
    * decontamination run reads the asset instead of re-shingling the
    * eval corpus (q298; same shape the streaming protocol takes).
    * Identical decisions by construction — [[contaminationPairs]]
    * delegates here.
    */
  def contaminationPairsFromSets(train: DataFrame, trainId: String,
                                 trainText: String, testSets: DataFrame,
                                 n: Int, tauPpm: Long,
                                 maxDf: Long = 1000L,
                                 mat: Materializer = Materialize.LocalLazy)
      : DataFrame = {
    require(tauPpm >= 1L && tauPpm <= 1000000L,
      s"tauPpm must be 1..1000000, got $tauPpm")
    // defensive normalization at the ASSET boundary only: a stored or
    // hand-built eval set may carry duplicate shingles, which would
    // inflate nb and deflate containment
    crossPairsRawFromSets(train, trainId, trainText,
        testSets.select($"test_id", array_distinct($"shs").as("shs")),
        n, maxDf, mat)
      .withColumn("cont_test_ppm", expr("inter * 1000000 DIV nb"))
      .filter($"cont_test_ppm" >= tauPpm)
  }

  /** Any-overlap rule (the GPT-3 13-gram filter): every train×test
    * pair sharing ≥ 1 rare n-gram, with the exact shared-shingle
    * count. Returns (train_id, test_id, n_shared, na, nb).
    */
  def sharedNgramPairs(train: DataFrame, trainId: String,
                       trainText: String, test: DataFrame,
                       testId: String, testText: String, n: Int,
                       maxDf: Long = 1000L,
                       mat: Materializer = Materialize.LocalLazy): DataFrame =
    crossPairsRaw(train, trainId, trainText, test, testId, testText,
        n, maxDf, mat)
      .select($"train_id", $"test_id", $"inter".as("n_shared"),
        $"na", $"nb")

  /** The decontaminated training corpus: `train` minus every doc
    * flagged by `pairs` (either rule's output). One left-anti join on
    * the (tiny) contaminated-id set.
    */
  def decontaminate(train: DataFrame, trainId: String,
                    pairs: DataFrame): DataFrame =
    train.join(pairs.select($"train_id".as("_cid")).distinct(),
      col(trainId) === $"_cid", "left_anti")
}
