package graft
package ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learned text classification over token counts — the fastText-shaped
  * classifier every production curation stack runs (quality/spam/domain
  * gating: Joulin et al., "Bag of tricks for efficient text
  * classification", EACL 2017; FineWeb's edu-quality gate is this
  * architecture distilled from a larger judge). Training is multinomial
  * Naive Bayes counts; scoring is the repo's fixed-point discipline:
  * per-token class weights in exact parts-per-BILLION (ppb — the count
  * ratios here are a vocabulary-smoothed 1/(n_c+V) scale finer than
  * ppm), summed linearly per document, argmax with a deterministic
  * (score desc, label asc) tie. The linear-domain sum is the log-free
  * form: per token, sign(p(tok|c) − p(tok|c')) = sign of the log-odds,
  * and ln's last-ulp behavior is libm-specific (the q61/q194 lesson) —
  * the decision is a deterministic pure function of integer counts that
  * two engines replay bit-for-bit.
  *
  * Scale shape (100 TB): training is one explode+count with map-side
  * combine (output bounded by classes × vocabulary, never the corpus);
  * prediction — the corpus-sized pass — is ONE token-keyed equi-join
  * against the weight table (inner: absent tokens contribute only the
  * per-class base rate, folded in as n_tokens × rate0), one
  * (doc, class) aggregate, and a classes-bounded per-doc window.
  * The base-rate table is classes-sized and broadcast. Nothing is
  * driver-side; hot-token skew on the join key is AQE skew territory.
  */
object Classify {
  import TextAnalysis.toks

  /** Exact integer division ([[graft.functions.Fns.exactDiv]] — the
    * shared fixed-point helper; exact for operands ≤ 2^53).
    */
  private def exactDiv(num: org.apache.spark.sql.Column,
                       den: org.apache.spark.sql.Column) =
    graft.functions.Fns.exactDiv(num, den)

  private val PPB = 1000000000L

  /** The largest (label, token) training count whose ppb-scaled
    * numerator (cnt+1)·10⁹ stays ≤ 2^53 and therefore divides exactly
    * ([[graft.functions.Fns.maxExactCnt]]) — ~9.0e6. Past it the
    * double division rounds and the claimed bit-for-bit cross-engine
    * replay silently breaks (the ppb scale hits the bound 1000×
    * earlier than LangModel's ppm), so [[tokenWeights]] fails CLOSED
    * in-plan instead: shard the training slice (the
    * maintained-partials path keeps per-segment counts under the
    * bound) or rescale to ppm past it.
    */
  private val MaxExactCnt = graft.functions.Fns.maxExactCnt(PPB)

  /** Per-class token counts (label, tok, cnt) over the labeled
    * training slice — the whole trainable state of the classifier,
    * and (deliberately) a plain additive count table: the maintained
    * face is the q210 sum-merge law.
    */
  def classTokenCounts(docs: DataFrame, labelCol: String,
                       textCol: String): DataFrame =
    docs.select(col(labelCol).as("label"),
        explode(toks(col(textCol))).as("tok"))
      .groupBy("label", "tok").agg(count(lit(1)).as("cnt"))

  /** Add-1-smoothed per-token class weights (label, tok, delta_ppb):
    * delta = rate(tok|label) − rate0(label), both exact integer ppb
    * with denominator n_label + V (V = training vocabulary size across
    * classes). Storing the DELTA against the absent-token base rate is
    * what lets prediction use an INNER join: a token missing from a
    * class's rows contributes exactly rate0, which [[predict]] folds
    * in as n_tokens × rate0 — no outer join over classes × vocabulary.
    */
  def tokenWeights(counts: DataFrame): DataFrame = {
    val ctot = counts.groupBy("label").agg(sum(col("cnt")).as("n_c"))
    val voc = broadcast(counts.agg(countDistinct(col("tok")).as("v")))
    // fail-closed exactness guard (round-15 review): a count past
    // MaxExactCnt would make the ppb division round instead of divide
    // exactly — raise in-plan ([[graft.functions.Fns.guardExact]], the
    // shared spelling) rather than silently drift off the
    // oracle-replayable arithmetic
    val cnt = graft.functions.Fns.guardExact(col("cnt"), MaxExactCnt,
      "Classify.tokenWeights")
    counts.join(ctot, Seq("label")).crossJoin(voc)
      .select(col("label"), col("tok"),
        (exactDiv((cnt + 1L) * lit(PPB), col("n_c") + col("v")) -
          exactDiv(lit(PPB), col("n_c") + col("v"))).as("delta_ppb"))
  }

  /** Per-class absent-token base rate (label, rate0_ppb) =
    * 1·10⁹ DIV (n_label + V) — classes-sized, broadcast at predict.
    */
  def baseRates(counts: DataFrame): DataFrame = {
    val ctot = counts.groupBy("label").agg(sum(col("cnt")).as("n_c"))
    val voc = broadcast(counts.agg(countDistinct(col("tok")).as("v")))
    ctot.crossJoin(voc)
      .select(col("label"),
        exactDiv(lit(PPB), col("n_c") + col("v")).as("rate0_ppb"))
  }

  /** The full (doc, class) score frame BEFORE the argmax:
    * score(doc, c) = Σ_present delta_ppb + n_tokens × rate0_ppb(c) —
    * one token-keyed inner join, one (doc, class) aggregate, one
    * broadcast of the classes-sized rate table. Exposed so the
    * argmax ([[predict]]) and the binary margin ([[marginScores]])
    * share ONE spelling of the scoring arithmetic. Output:
    * (idCol, label, score_ppb) — exactly classes rows per document.
    */
  def scoreAll(docs: DataFrame, idCol: String, textCol: String,
               weights: DataFrame, rates: DataFrame): DataFrame = {
    val dsum = docs
      .select(col(idCol), explode(toks(col(textCol))).as("tok"))
      .join(weights, Seq("tok"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("delta_ppb")).as("dsum"))
    val docn = docs.select(col(idCol),
      size(toks(col(textCol))).cast("long").as("n_tokens"))
    docn.crossJoin(broadcast(rates))
      .join(dsum, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        (coalesce(col("dsum"), lit(0L)) +
          col("n_tokens") * col("rate0_ppb")).as("score_ppb"))
  }

  /** Classify every document: [[scoreAll]] + argmax with (score desc,
    * label asc) ties. A document with NO trained token (or no tokens
    * at all) scores n_tokens × rate0 for every class and resolves to
    * the first label — deterministic, stated. Output:
    * (idCol, predicted, score_ppb).
    *
    * The argmax is ONE hash aggregate — min over (−score, label)
    * structs, whose lexicographic order IS (score desc, label asc) —
    * instead of a row_number window: the aggregate combines map-side
    * and never sorts the (doc × class) frame, where the window form
    * paid an exchange + sort per call even with WindowGroupLimit
    * truncation (r18 optimization; negation is exact — |score_ppb| ≤
    * n_tokens·10⁹ ≪ 2⁶³). Decision unchanged: every predict consumer
    * stays under its unchanged oracle.
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              weights: DataFrame, rates: DataFrame): DataFrame =
    scoreAll(docs, idCol, textCol, weights, rates)
      .groupBy(col(idCol))
      .agg(min(struct((-col("score_ppb")).as("_neg"),
        col("label").as("label"))).as("_m"))
      .select(col(idCol), col("_m.label").as("predicted"),
        (-col("_m._neg")).as("score_ppb"))

  /** Binary decision margin: score(posLabel) − score(negLabel) in
    * exact ppb — the two-class gate shape every production
    * quality/spam filter actually thresholds on (FineWeb-edu keeps
    * `score >= threshold` rather than the argmax). One row per
    * document; REQUIREs both labels present in the rate table (a
    * missing class would silently zero its half of the margin).
    * Output: (idCol, margin_ppb).
    */
  def marginScores(docs: DataFrame, idCol: String, textCol: String,
                   weights: DataFrame, rates: DataFrame,
                   posLabel: String, negLabel: String): DataFrame = {
    require(posLabel != negLabel, "posLabel must differ from negLabel")
    // classes-sized driver fetch — bounded; the fetched rows ALSO
    // become the rate table scoreAll consumes (LocalRelation pin), so
    // a lazily-derived rates plan is not recomputed once for the
    // validation and again inside the scoring join (round-16 review —
    // the validatedBudgets lesson)
    val rateRows = rates.collect()
    val labelIdx = rates.schema.fieldIndex("label")
    val labels = rateRows.map(_.getString(labelIdx)).toSet
    require(labels.contains(posLabel) && labels.contains(negLabel),
      s"marginScores: rate table lacks one of ($posLabel, $negLabel)")
    val ratesLocal = rates.sparkSession.createDataFrame(
      java.util.Arrays.asList(rateRows: _*), rates.schema)
    scoreAll(docs, idCol, textCol, weights, ratesLocal)
      .filter(col("label").isin(posLabel, negLabel))
      .groupBy(col(idCol))
      .agg(sum(when(col("label") === posLabel, col("score_ppb"))
        .otherwise(-col("score_ppb"))).as("margin_ppb"))
  }

  /** Precision-targeted threshold calibration over a held-out
    * labeled slice — how production gates pick their cutoff
    * (FineWeb-edu: keep `score >= t` with t calibrated to a target
    * precision, rather than trusting the argmax). Candidate
    * thresholds are the DISTINCT held-out margins; for each,
    * keep(t) = {margin >= t} and precision(t) = kept-positives /
    * kept. Returns the SMALLEST t meeting `targetPpm` — the
    * keep-most-data point satisfying the bound — computed as one
    * cumulative window over the distinct margins (held-out-sized by
    * design: the calibration slice is small, never the corpus — the
    * single-partition sort is over distinct margin VALUES) and a
    * 1-row driver fetch (bounded). Exact integer throughout: the
    * precision test cross-multiplies (cum_pos·10⁶ >= target·cum_n —
    * no division, and ANSI mode faults on long overflow rather than
    * wrapping), so two engines replay the chosen threshold
    * bit-for-bit. THROWS when no threshold meets the target: a gate
    * that cannot reach its contracted precision must fail loudly,
    * not silently ship a best-effort cutoff.
    */
  def calibrateThreshold(held: DataFrame, marginCol: String,
                         isPosCol: String, targetPpm: Long): Long = {
    require(targetPpm >= 0L && targetPpm <= 1000000L,
      s"targetPpm must be in [0, 1e6], got $targetPpm")
    val byM = held.groupBy(col(marginCol).as("t"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(isPosCol), 1L).otherwise(0L)).as("np"))
    val w = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = byM
      .select(col("t"), sum(col("n")).over(w).as("cn"),
        sum(col("np")).over(w).as("cnp"))
      .filter(col("cnp") * lit(1000000L) >= lit(targetPpm) * col("cn"))
      .agg(min(col("t"))).head()
    require(!r.isNullAt(0),
      s"calibrateThreshold: no threshold achieves precision $targetPpm ppm")
    // integral-type-lenient fetch (the sketch/ladder getAs[Number]
    // discipline — round-16 review): an IntegerType margin column
    // must not ClassCastException after the whole sweep ran
    r.getAs[Number](0).longValue()
  }

  // ------------------------------------------------------ maintained
  /** Per-segment class-token count partials (segment, label, tok,
    * cnt) — counts are plain sums, so any segmentation of the labeled
    * corpus serves the exact [[classTokenCounts]] table (q210's law;
    * ClassifySpec property; q259 runs under q258's oracle verbatim).
    */
  def classTokenPartials(docs: DataFrame, segmentCol: String,
                         labelCol: String, textCol: String): DataFrame =
    docs.select(col(segmentCol), col(labelCol).as("label"),
        explode(toks(col(textCol))).as("tok"))
      .groupBy(segmentCol, "label", "tok").agg(count(lit(1)).as("cnt"))

  /** Sum-merge stored partials back to the exact count table —
    * vocabulary-sized work, the corpus is never re-read.
    */
  def mergeClassTokenCounts(partials: DataFrame): DataFrame =
    partials.groupBy("label", "tok").agg(sum(col("cnt")).as("cnt"))
}
