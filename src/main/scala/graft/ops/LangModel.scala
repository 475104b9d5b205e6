package graft
package ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** N-gram language-model quality filtering — the CCNet/RedPajama/
  * FineWeb curation step this tier was still missing: train a bigram
  * LM on a trusted reference slice, score every candidate document's
  * fluency under it, and keep the fluent tail. Production pipelines do
  * this with a KenLM perplexity (Wenzek et al., "CCNet: Extracting
  * high quality monolingual datasets from web crawl data", LREC 2020);
  * the scoring discipline here is the repo-wide fixed-point rule: the
  * model is exact integer counts and every per-token score is an exact
  * integer ppm (stupid backoff — Brants et al., "Large Language Models
  * in Machine Translation", EMNLP 2007 — whose scores are count ratios,
  * no discounting arithmetic), so two independent engines replay the
  * decision bit-for-bit. The document score is the arithmetic-mean
  * transition likelihood in ppm rather than the geometric mean
  * (perplexity): log's last-ulp behavior is libm-specific (the q61/q194
  * lesson), and for the FILTERING regime the two agree where it
  * matters — gibberish scores near 0 on both, fluent text scores high
  * on both.
  *
  * Scale shape (100 TB): training is two explode+count aggregations
  * with map-side combine (the q61 shape) plus one vocabulary-keyed join
  * to denormalize the conditional's denominator INTO the model — so
  * scoring, the corpus-sized pass, pays exactly two token-keyed
  * equi-joins (bigram model on (w1,w2), unigram backoff on w2) and one
  * doc-keyed aggregate. Nothing is all-pairs, nothing is driver-side;
  * hot-token skew on the backoff key is AQE skew-join territory and the
  * (w1,w2) model key is already fine-grained. A real-vocabulary model
  * (1e6–1e8 rows) broadcasts or shuffles by size — Spark's join
  * selection decides, both plans are linear in the corpus.
  */
object LangModel {
  import TextAnalysis.toks

  /** Exact integer division ([[graft.functions.Fns.exactDiv]] — the
    * shared fixed-point helper): exactness holds while the NUMERATOR
    * stays ≤ 2^53, and the ppm-scaled numerators here are cnt·10⁶ —
    * so the real bound is ~9.0e9 on any single model count
    * ([[graft.functions.Fns.maxExactCnt]]; counts are bounded by
    * reference tokens, so a reference slice past ~9e9 tokens can
    * breach it — NOT the ~9e15 an earlier draft claimed, which is
    * the raw-long bound before scaling). [[scoreDocs]] guards the
    * model counts fail-closed at the point of division (the same
    * in-plan raise_error discipline as Classify.tokenWeights);
    * denominators need no guard (exact 0 below, ≤ numerator above).
    * Past the bound: shard the reference (the maintained-partials
    * path keeps per-segment counts small) or swap to DECIMAL(38,0).
    */
  private def exactDiv(num: Column, den: Column): Column =
    Fns.exactDiv(num, den)

  /** The largest model count whose ppm-scaled numerator divides
    * exactly — (2^53 DIV 10⁶) − 1 ≈ 9.0e9.
    */
  private val MaxExactCnt = Fns.maxExactCnt(1000000L)

  /** Exact integer ppm: num·10⁶ DIV den. */
  private def ppmOf(num: Column, den: Column): Column =
    Fns.exactPpm(num, den)

  /** Adjacent-token (w1, w2) pairs as a struct array — the linear
    * zip-against-the-tail from [[TextAnalysis.collocations]] (the
    * generic shingles HOF re-slices per element); zip_with pads the
    * shorter tail with null, the filter drops the padded cell.
    */
  private def adjacentPairs(t: Column): Column =
    filter(
      zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)

  /** Unigram counts (tok, cnt) of the reference corpus — one
    * explode+count with map-side combine; output is vocabulary-sized.
    */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(toks(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** The bigram conditional model: (w1, w2, cnt_ab, cnt_a) with the
    * conditioning unigram count DENORMALIZED in at train time, so the
    * corpus-sized scoring pass attaches the whole conditional in ONE
    * (w1,w2)-keyed join instead of a second w1 join per transition.
    * Train-time cost: one bigram explode+count plus one
    * vocabulary-keyed equi-join (model-sized, not corpus-sized).
    */
  def bigramModel(docs: DataFrame, textCol: String): DataFrame =
    bigramCounts(docs, textCol)
      .join(unigramCounts(docs, textCol)
        .select(col("tok").as("w1"), col("cnt").as("cnt_a")), Seq("w1"))

  /** Raw adjacent-bigram counts (w1, w2, cnt_ab) — the additive half
    * of [[bigramModel]], exposed for the maintained/streaming count
    * states (the denominator attaches at serve time there).
    */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(adjacentPairs(toks(col(textCol)))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt_ab"))

  /** Per-document fluency under stupid backoff, exact integer ppm.
    * Transition score for (w1 → w2):
    *   - bigram in model:            cnt_ab·10⁶ DIV cnt_a
    *   - else w2 in vocabulary:      alphaPpm·cnt_b DIV n_tok
    *   - else (OOV continuation):    0
    * Document fluency = sum(score) DIV n_trans (0 when the document
    * has < 2 tokens); oov_ppm = unseen-token rate over ALL tokens.
    * Output: (idCol, n_tokens, n_trans, oov_ppm, fluency_ppm).
    *
    * Two corpus passes, both linear: the transition pass (explode →
    * model join → backoff join → doc aggregate) and the token pass
    * (explode → vocabulary join → doc aggregate), merged on the doc
    * key. alphaPpm is Brants' 0.4 backoff weight in ppm.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                model: DataFrame, uni: DataFrame,
                alphaPpm: Long = 400000L): DataFrame = {
    require(alphaPpm > 0L && alphaPpm <= 1000000L,
      s"alphaPpm must be in (0, 1e6], got $alphaPpm")
    // n_tok: total reference token count — a 1-row aggregate of the
    // vocabulary-sized unigram table, broadcast into the scorers.
    val totals = broadcast(uni.agg(sum(col("cnt")).as("n_tok")))
    val trans = docs
      .select(col(idCol), explode(adjacentPairs(toks(col(textCol)))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(model, Seq("w1", "w2"), "left")
      .join(uni.select(col("tok").as("w2"), col("cnt").as("cnt_b")),
        Seq("w2"), "left")
      .crossJoin(totals)
      .select(col(idCol),
        // fail-closed exactness guards (ADVICE r15): the ppm-scaled
        // numerators cnt_ab·10⁶ and alphaPpm·cnt_b (alphaPpm ≤ 10⁶ by
        // the require above) lose double exactness past MaxExactCnt —
        // guard INSIDE the consumed branch so the raise fires exactly
        // when the unsound division would happen
        when(col("cnt_ab").isNotNull,
          ppmOf(Fns.guardExact(col("cnt_ab"), MaxExactCnt,
            "LangModel.scoreDocs"), col("cnt_a")))
          .when(col("cnt_b").isNotNull,
            exactDiv(lit(alphaPpm) * Fns.guardExact(col("cnt_b"),
              MaxExactCnt, "LangModel.scoreDocs"), col("n_tok")))
          .otherwise(lit(0L)).as("s"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trans"), sum(col("s")).as("s_sum"))
    val tokens = docs
      .select(col(idCol), explode(toks(col(textCol))).as("tok"))
      .join(uni.withColumnRenamed("cnt", "u_cnt"), Seq("tok"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("u_cnt").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol))
      .join(tokens, Seq(idCol), "left")
      .join(trans, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0L, lit(0L))
          .otherwise(ppmOf(col("n_oov"), col("n_tokens"))).as("oov_ppm"),
        when(coalesce(col("n_trans"), lit(0L)) === 0L, lit(0L))
          .otherwise(exactDiv(col("s_sum"), col("n_trans")))
          .as("fluency_ppm"))
  }

  /** The keep decision of the CCNet-shaped filter: fluent enough under
    * the reference LM and not dominated by unseen tokens. Pure filter
    * over [[scoreDocs]] output.
    */
  def filterFluent(scored: DataFrame, minFluencyPpm: Long,
                   maxOovPpm: Long): DataFrame =
    scored.filter(col("fluency_ppm") >= minFluencyPpm &&
      col("oov_ppm") <= maxOovPpm)

  // -------------------------------------------------------- trigram
  /** Adjacent (w1, w2, w3) triples as a struct array — one more
    * zip-against-the-tail than [[adjacentPairs]]; zip_with pads the
    * short tails with null, the filter drops padded cells, so < 3
    * tokens yields no triples.
    */
  private def adjacentTriples(t: Column): Column =
    filter(
      zip_with(
        zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        slice(t, lit(3), greatest(size(t) - 2, lit(0))),
        (p, c) => struct(p.getField("w1").as("w1"),
          p.getField("w2").as("w2"), c.as("w3"))),
      x => x.getField("w2").isNotNull && x.getField("w3").isNotNull)

  /** Raw adjacent-trigram counts (w1, w2, w3, cnt_abc). */
  def trigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(adjacentTriples(toks(col(textCol)))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"),
        col("p.w3").as("w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt_abc"))

  /** The trigram conditional model: (w1, w2, w3, cnt_abc, cnt_ab) —
    * the context-bigram denominator denormalized in at train time
    * (the [[bigramModel]] move one order up), so scoring attaches the
    * whole trigram conditional in ONE (w1,w2,w3)-keyed join. The
    * model head grows with distinct trigrams (vocab³-bounded, in
    * practice corpus-transition-bounded: 31 → 908 → 7366 rows at the
    * sf0.01 reference — PROFILE round 16 has the honest growth).
    */
  def trigramModel(docs: DataFrame, textCol: String): DataFrame =
    trigramCounts(docs, textCol)
      .join(bigramCounts(docs, textCol), Seq("w1", "w2"))

  /** Per-document fluency under TRIGRAM stupid backoff — the rung
    * above [[scoreDocs]] that completes the CCNet shape (Brants'
    * backoff chain at order 3), same exact-integer-ppm discipline.
    * Transition score for (w1, w2 → w3):
    *   - trigram in model:           cnt_abc·10⁶ DIV cnt_ab
    *   - else bigram (w2,w3) known:  alphaPpm·cnt_bc DIV cnt_b
    *   - else w3 in vocabulary:      alphaSqPpm·cnt_c DIV n_tok
    *     (alphaSqPpm = alphaPpm² DIV 10⁶ — REQUIREd exact, which the
    *     default 0.4 satisfies: keeping α² at ppm scale bounds the
    *     numerator like every other branch instead of the naive
    *     alphaPpm²·cnt_c blowing the 2^53 envelope at cnt_c ≈ 5.6e4)
    *   - else (OOV continuation):    0
    * Document fluency = sum DIV n_tri (0 when < 3 tokens); oov_ppm
    * over all tokens as in [[scoreDocs]]. `bi` is a [[bigramModel]]
    * frame (probed at (w2, w3)), `uni`/`tri` as trained above. Model
    * counts guarded fail-closed exactly like [[scoreDocs]].
    * Output: (idCol, n_tokens, n_tri, oov_ppm, fluency_ppm).
    *
    * Scale shape: the corpus pass is now THREE token-keyed equi-joins
    * (trigram, bigram-backoff, unigram-backoff) and one doc
    * aggregate — still nothing all-pairs, still linear; the trigram
    * join key is finer-grained than the bigram one, so skew only
    * improves with order.
    */
  def scoreDocsTrigram(docs: DataFrame, idCol: String, textCol: String,
                       tri: DataFrame, bi: DataFrame, uni: DataFrame,
                       alphaPpm: Long = 400000L): DataFrame = {
    require(alphaPpm > 0L && alphaPpm <= 1000000L,
      s"alphaPpm must be in (0, 1e6], got $alphaPpm")
    require(alphaPpm * alphaPpm % 1000000L == 0L,
      s"alphaPpm² must be an exact ppm (alphaPpm $alphaPpm is not — " +
        "pick a backoff weight whose square is a whole ppm)")
    val alphaSqPpm = alphaPpm * alphaPpm / 1000000L
    val totals = broadcast(uni.agg(sum(col("cnt")).as("n_tok")))
    val trans = docs
      .select(col(idCol),
        explode(adjacentTriples(toks(col(textCol)))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"),
        col("p.w3").as("w3"))
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("cnt_ab").as("cnt_bc"), col("cnt_a").as("cnt_b")),
        Seq("w2", "w3"), "left")
      .join(uni.select(col("tok").as("w3"), col("cnt").as("cnt_c")),
        Seq("w3"), "left")
      .crossJoin(totals)
      .select(col(idCol),
        when(col("cnt_abc").isNotNull,
          ppmOf(Fns.guardExact(col("cnt_abc"), MaxExactCnt,
            "LangModel.scoreDocsTrigram"), col("cnt_ab")))
          .when(col("cnt_bc").isNotNull,
            exactDiv(lit(alphaPpm) * Fns.guardExact(col("cnt_bc"),
              MaxExactCnt, "LangModel.scoreDocsTrigram"), col("cnt_b")))
          .when(col("cnt_c").isNotNull,
            exactDiv(lit(alphaSqPpm) * Fns.guardExact(col("cnt_c"),
              MaxExactCnt, "LangModel.scoreDocsTrigram"), col("n_tok")))
          .otherwise(lit(0L)).as("s"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tri"), sum(col("s")).as("s_sum"))
    val tokens = docs
      .select(col(idCol), explode(toks(col(textCol))).as("tok"))
      .join(uni.withColumnRenamed("cnt", "u_cnt"), Seq("tok"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("u_cnt").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol))
      .join(tokens, Seq(idCol), "left")
      .join(trans, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0L, lit(0L))
          .otherwise(ppmOf(col("n_oov"), col("n_tokens"))).as("oov_ppm"),
        when(coalesce(col("n_tri"), lit(0L)) === 0L, lit(0L))
          .otherwise(exactDiv(col("s_sum"), col("n_tri")))
          .as("fluency_ppm"))
  }

  // ------------------------------------------------------ maintained
  /** Per-segment unigram count partials (segment, tok, cnt) — the
    * stored face of [[unigramCounts]] under the q210 sum-merge law:
    * counts are plain sums, so ANY segmentation of the reference
    * corpus serves the exact model. One corpus pass per ingest
    * segment; output bounded by segments × vocabulary.
    */
  def unigramPartials(docs: DataFrame, segmentCol: String,
                      textCol: String): DataFrame =
    docs.select(col(segmentCol), explode(toks(col(textCol))).as("tok"))
      .groupBy(segmentCol, "tok").agg(count(lit(1)).as("cnt"))

  /** Per-segment bigram count partials (segment, w1, w2, cnt_ab). */
  def bigramPartials(docs: DataFrame, segmentCol: String,
                     textCol: String): DataFrame =
    docs.select(col(segmentCol),
        explode(adjacentPairs(toks(col(textCol)))).as("p"))
      .select(col(segmentCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(segmentCol, "w1", "w2").agg(count(lit(1)).as("cnt_ab"))

  /** Merge unigram partials to the exact [[unigramCounts]] table —
    * sum associativity, vocabulary-sized work, the corpus is never
    * re-read.
    */
  def mergeUnigrams(partials: DataFrame): DataFrame =
    partials.groupBy("tok").agg(sum(col("cnt")).as("cnt"))

  /** Sum-merge bigram count partials (the count half of
    * [[mergeBigramModel]], exposed so the streaming fold and the
    * partials serve share ONE spelling of the q210 merge law —
    * round-15 review).
    */
  def mergeBigramCounts(biPartials: DataFrame): DataFrame =
    biPartials.groupBy("w1", "w2").agg(sum(col("cnt_ab")).as("cnt_ab"))

  /** Merge bigram partials and attach the merged unigram denominator —
    * equal to [[bigramModel]] over the union by sum associativity
    * (LangModelSpec property; q257 runs it under q256's oracle
    * verbatim). Model-sized work only.
    */
  def mergeBigramModel(biPartials: DataFrame, uni: DataFrame): DataFrame =
    mergeBigramCounts(biPartials)
      .join(uni.select(col("tok").as("w1"), col("cnt").as("cnt_a")),
        Seq("w1"))

  /** Sum-merge trigram count partials — the q210 law at order 3,
    * shared by the streaming fold and any stored-partials serve.
    */
  def mergeTrigramCounts(triPartials: DataFrame): DataFrame =
    triPartials.groupBy("w1", "w2", "w3")
      .agg(sum(col("cnt_abc")).as("cnt_abc"))

  /** Merge trigram partials and attach the merged context-bigram
    * denominator — equal to [[trigramModel]] over the union by sum
    * associativity (LangModelSpec property; q275 runs the streaming
    * fold under q274's oracle verbatim). `biCounts` is a merged
    * (w1, w2, cnt_ab) table ([[mergeBigramCounts]] output).
    */
  def mergeTrigramModel(triPartials: DataFrame,
                        biCounts: DataFrame): DataFrame =
    mergeTrigramCounts(triPartials).join(biCounts, Seq("w1", "w2"))
}
