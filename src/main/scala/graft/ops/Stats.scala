package graft
package ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics for corpus analysis (length/score
  * distributions at 100 TB).
  */
object Stats {

  /** EXACT discrete percentiles of an integer-valued column: the value
    * at 0-based sorted position floor((n-1)*p) — the lower
    * quantile_disc convention, defined identically in the SQL oracle
    * so there is no cross-engine interpolation ambiguity.
    *
    * Scale shape: ONE aggregation builds the value histogram (shuffle
    * proportional to DISTINCT values, with map-side combine), the
    * cumulative window then runs over that tiny histogram — never over
    * the rows — and the final percentile picks are one more
    * aggregation of it. This is how exact percentiles stay feasible at
    * corpus scale when the value domain is bounded (text lengths,
    * token counts, star ratings); for unbounded/continuous domains use
    * percentile_approx (engine-specific, not oracle-comparable).
    *
    * Returns a single row with one BIGINT column per requested
    * percentile, named p&lt;percent&gt; (p25, p50, ...).
    */
  def discretePercentiles(df: DataFrame, valueCol: String,
                          ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0, 1], got $ps")
    val hist = df.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    // window over DISTINCT values only — bounded, not corpus-sized
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val tot = broadcast(df.agg(count(lit(1)).as("n")))
    val picks = ps.map { p =>
      val name = "p" + math.round(p * 100)
      // 1-based target rank floor((n-1)*p)+1; answer = min v whose
      // cumulative count reaches it
      min(when(col("cum") >= floor((col("n") - 1) * lit(p)) + 1, col("v")))
        .as(name)
    }
    cum.crossJoin(tot).agg(picks.head, picks.tail: _*)
  }

  /** Per-GROUP exact discrete percentiles — the corpus-analysis
    * report form ("p50/p95 document length per language"), same lower
    * quantile_disc convention as [[discretePercentiles]]. One row per
    * group with a BIGINT p&lt;percent&gt; column per requested
    * percentile.
    *
    * Scale shape: the histogram aggregate shuffles (group, value)
    * pairs with map-side combine, and the cumulative window is
    * PARTITIONED by group — unlike the global form's single-task
    * ordering, every group's (bounded) histogram ranks in parallel,
    * so adding groups adds parallelism, not a bottleneck. The rank
    * expression floor((n−1)·p)+1 is one correctly-rounded double
    * multiply on both engines (n exact below 2^53), so picks replay
    * bit-identically.
    */
  def discretePercentilesBy(df: DataFrame, groupCol: String,
                            valueCol: String,
                            ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0, 1], got $ps")
    val hist = df.groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val tot = df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n"))
    val picks = ps.map { p =>
      val name = "p" + math.round(p * 100)
      min(when(col("cum") >= floor((col("n") - 1) * lit(p)) + 1, col("v")))
        .as(name)
    }
    cum.join(broadcast(tot), Seq("g"))
      .groupBy(col("g").as(groupCol))
      .agg(picks.head, picks.tail: _*)
  }

  /** APPROXIMATE quantiles for unbounded/continuous integer domains:
    * fixed-width binned histogram + exact-integer interpolation inside
    * the hit bin. The estimate for percent `p` is
    *
    *   bin*w + ((rank_p - cumBefore - 1) * w) DIV cnt_bin
    *
    * with rank_p = (n-1)*p DIV 100 + 1 (the same lower-quantile rank
    * convention as [[discretePercentiles]]) — every step is int64
    * arithmetic, so the estimate is deterministic on any partitioning
    * and bit-identical in any engine (q75's oracle replays it). Error
    * is bounded by `binWidth` (the true value lies in the hit bin and
    * the interpolation assumes uniformity within it).
    *
    * Scale shape: where [[discretePercentiles]]' shuffle grows with
    * the number of DISTINCT values, this histogram is bounded by
    * domain/binWidth — the operator for value domains too large or
    * too continuous to histogram exactly (byte sizes, token counts at
    * 100 TB), with the memory/error knob explicit. Nonnegative values
    * only (rank and offset arithmetic relies on nonneg division).
    *
    * Returns one row with a BIGINT `p<percent>_est` column per
    * requested percent.
    */
  def binnedQuantiles(df: DataFrame, valueCol: String, binWidth: Long,
                      pcts: Seq[Int]): DataFrame = {
    require(binWidth >= 1L, s"binWidth must be >= 1, got $binWidth")
    require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 100),
      s"percents must be in [0, 100], got $pcts")
    // exact int64 floor division (the Tables.load pattern)
    val bin = expr(s"(CAST($valueCol AS BIGINT) - " +
      s"pmod(CAST($valueCol AS BIGINT), $binWidth)) DIV $binWidth")
    val hist = df.groupBy(bin.as("bin")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val tot = broadcast(df.agg(count(lit(1)).as("n")))
    def rank(p: Int) = s"(((n - 1) * $p) DIV 100 + 1)"
    val firstHit = pcts.map { p =>
      min(when(expr(s"cum >= ${rank(p)}"),
        struct(col("bin"), col("cum"), col("cnt")))).as(s"_b$p")
    }
    val agged = cum.crossJoin(tot)
      .agg(firstHit.head, (firstHit.tail :+ max(col("n")).as("n")): _*)
    val ests = pcts.map { p =>
      expr(s"_b$p.bin * $binWidth + " +
        s"((${rank(p)} - (_b$p.cum - _b$p.cnt) - 1) * $binWidth) DIV _b$p.cnt")
        .as(s"p${p}_est")
    }
    agged.select(ests: _*)
  }

  /** Per-group WEIGHTED lower median: the smallest value v whose
    * cumulative weight reaches half the group total — the convention
    * written as 2·cumw(v) >= totw so there is NO division anywhere
    * (weights aggregate through exact DECIMAL(18,4), and halving a
    * decimal would reopen the rounding-convention question the
    * engine's determinism discipline exists to close). The
    * "median price weighted by volume" reporting shape.
    *
    * Scale: the [[discretePercentilesBy]] histogram protocol with
    * weight sums instead of counts — shuffle ∝ distinct values per
    * group (map-side combined), cumulative window over the bounded
    * histogram partitioned per group. Output: (groupCol, wmedian).
    *
    * Weights must be NONNEGATIVE: a negative weight makes the
    * cumulative sum non-monotone, so "first v with 2·cum >= tot" no
    * longer names a meaningful median (ADVICE r10). Enforced in-plan
    * (no extra job): the total aggregate also carries min(weight),
    * and the result expression raises before emitting a row for any
    * group containing a negative weight.
    */
  def weightedMedianBy(df: DataFrame, groupCol: String, valueCol: String,
                       weightCol: String): DataFrame = {
    val hist = df.groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(sum(col(weightCol).cast("decimal(18,4)")).as("w"))
    val win = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("w")).over(win))
    val tot = df.groupBy(col(groupCol).as("g"))
      .agg(sum(col(weightCol).cast("decimal(18,4)")).as("tw"),
        min(col(weightCol).cast("decimal(18,4)")).as("minw"))
    cum.join(tot, Seq("g"))
      .groupBy(col("g").as(groupCol))
      .agg(min(when(col("cum") * 2 >= col("tw"), col("v"))).as("_wm"),
        min(col("minw")).as("_minw"))
      .select(col(groupCol),
        when(col("_minw") < 0,
          raise_error(concat(lit("weightedMedianBy: negative weight in group "),
            col(groupCol).cast("string"))))
          .otherwise(col("_wm")).as("wmedian"))
  }

  /** Per-group ROBUST outliers — the Hampel / median-absolute-deviation
    * fence: a row is an outlier iff |v − median(group)| > k·MAD(group),
    * MAD = median of the absolute deviations. Why MAD and not stddev
    * at corpus scale: mean/σ have a breakdown point of zero — ONE
    * crawl artifact (a 2 GB concatenated page, a length-0 burst)
    * drags the fence toward itself and masks every other anomaly,
    * while median/MAD tolerate up to 50% contamination. Both medians
    * are the EXACT lower discrete quantile via the bounded-histogram
    * protocol of [[discretePercentilesBy]], and the fence compare is
    * pure int64 — so the flagged set is deterministic on any
    * partitioning and replays exactly in SQL (no σ-estimator
    * convention to disagree on).
    *
    * Scale shape: two bounded-histogram aggregates (values, then
    * deviations — shuffle ∝ distinct values per group, map-side
    * combined), each result one scalar row per group joined back on
    * the group key. The join strategy is deliberately left to the
    * planner: a handful of groups broadcasts (the report case), a
    * high-cardinality groupCol degrades to a keyed shuffle join
    * instead of an OOM'd forced broadcast. Output: the input rows
    * that breach the fence, plus (med, mad, adev).
    */
  def madOutliersBy(df: DataFrame, groupCol: String, valueCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val med = discretePercentilesBy(df, groupCol, valueCol, Seq(0.5))
      .select(col(groupCol), col("p50").as("med"))
    val dev = df.join(med, Seq(groupCol))
      .withColumn("adev", abs(col(valueCol) - col("med")))
    val mad = discretePercentilesBy(dev, groupCol, "adev", Seq(0.5))
      .select(col(groupCol), col("p50").as("mad"))
    dev.join(mad, Seq(groupCol))
      .filter(col("adev") > lit(k.toLong) * col("mad"))
  }

  /** [[madOutliersBy]] with SKETCHED medians — the 100 TB swap for
    * value domains where the exact bounded-histogram protocol's
    * "shuffle ∝ distinct values per group" premise fails (corpus
    * byte-lengths, score distributions: distinct values ∝ corpus).
    * Both medians come from [[Sketches.quantilePartials]] rank
    * samples (sampleK rows per group, DKW rank error stated there);
    * the FENCE COMPARE stays exact and integer over every row, so
    * given the deterministic sample the flagged set replays exactly
    * in any engine — approximate fence, bit-exact gate (the
    * q175-over-q172 relationship applied to q153). Both sketches key
    * on the same row hash, so the deviation sample is the value
    * sample's own rows around the plug-in median. When sampleK
    * saturates every group this IS [[madOutliersBy]] (the permille
    * ceil-rank convention equals the exact lower-median rank for
    * every n — StatsSpec asserts equality).
    *
    * Scale shape: two corpus passes (value sample, then deviation
    * sample over the broadcast-median-attached rows, sealed once for
    * the sketch and the flag filter) + the flag pass; per-group state
    * is sampleK-bounded everywhere.
    */
  def madOutliersSketchBy(df: DataFrame, groupCol: String,
                          valueCol: String, keyCol: String,
                          sampleK: Int, k: Int,
                          mat: Materializer = Materialize.LocalLazy): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val s1 = Sketches.quantilePartials(df, Seq(groupCol), col(keyCol),
      col(valueCol), sampleK)
    val med = Sketches.quantileEstimates(s1, Seq(groupCol), Seq(500))
      .select(col(groupCol), col("p500").as("med"))
    val dev = mat(df.join(med, Seq(groupCol))
      .withColumn("adev", abs(col(valueCol) - col("med"))))
    val s2 = Sketches.quantilePartials(dev, Seq(groupCol), col(keyCol),
      col("adev"), sampleK)
    val mad = Sketches.quantileEstimates(s2, Seq(groupCol), Seq(500))
      .select(col(groupCol), col("p500").as("mad"))
    dev.join(mad, Seq(groupCol))
      .filter(col("adev") > lit(k.toLong) * col("mad"))
  }

  /** Sketch-binned distribution drift between a REFERENCE corpus and a
    * CURRENT corpus — the ingest-gate check "did this batch's
    * length/score/price distribution move?" (PSI's job, but with
    * engine-portable arithmetic: PSI's ln() is libm-specific, so the
    * distance here is total variation over equi-depth bins, which is
    * exact integer ppm end to end).
    *
    * Protocol (every step deterministic and oracle-replayable):
    *  1. bin edges = the REFERENCE side's bottom-k-by-hash quantile
    *     sketch ([[Sketches.quantilePartials]]) read at the nBins−1
    *     equi-depth permille points, distinct+sorted — data values,
    *     no arithmetic, so both engines hold identical edges;
    *  2. bin(v) = number of edges strictly below v (edges compared in
    *     DOUBLE — exact for integral values up to 2^53, the envelope
    *     the summary tier already documents); NULL values are
    *     excluded on both sides;
    *  3. per-bin rates in exact ppm (count·10⁶ DIV side total), per-
    *     bin |Δ|, and tvd_ppm = Σ|Δ| DIV 2 stamped on every row.
    *
    * Scale shape: the sketch collect is ONE bounded row (loop-control
    * discipline, like bpeTrain's per-round top-1); the edges fold
    * into a codegen'd comparison chain (nBins−1 branches, no join);
    * each side is then one linear scan into an nBins-sized aggregate;
    * the rate/TVD windows run over the nBins-row joined table. Two
    * passes over ref, one over cur — at 100 TB serve the edges from
    * the MAINTAINED quantile summary (q181's asset) instead of
    * re-sketching, which drops the ref cost to one pass too.
    */
  /** Per-group winsorization (outlier clipping at sketch quantiles) —
    * the standard robust-preprocessing step before scale-sensitive
    * aggregates: each value is clamped into the group's
    * [p(loPermille), p(hiPermille)] band, the band coming from the
    * bottom-k-by-hash quantile sketch ([[Sketches.quantilePartials]]
    * — deterministic, so the clipped table replays exactly).
    *
    * Pinned semantics: NULL values stay NULL (explicit guard — both
    * engines' least/greatest IGNORE nulls, which would silently clamp
    * a NULL to the lower edge); a group absent from the sketch (all
    * values NULL) passes through unclamped via the left join; NULL
    * group KEYS clamp into the NULL group's band (null-safe join —
    * the sketch's groupBy computed a band for the NULL group, so the
    * rows it was computed FROM must receive it; ADVICE r12); band
    * edges are sketch SAMPLE values (no interpolation).
    *
    * Scale shape: one sketch pass, then ONE broadcast join of the
    * group-edge table (groups × 2 values) and a codegen'd clamp —
    * the corpus is scanned twice, shuffled never. With a maintained
    * quantile summary (q181) the sketch pass is served from the
    * asset instead.
    */
  def winsorizeBy(df: DataFrame, groupCol: String, keyExpr: String,
                  valueCol: String, loPermille: Int, hiPermille: Int,
                  k: Int = 512): DataFrame =
    winsorizeFromPartials(df, groupCol,
      Sketches.quantilePartials(df, Seq(groupCol), expr(keyExpr),
        col(valueCol), k),
      valueCol, loPermille, hiPermille)

  /** [[winsorizeBy]]'s clamp served from EXISTING quantile-sketch
    * partials — the composition winsorizeBy's own doc promises at
    * 100 TB (the q215 discipline applied to the clamp): the
    * MAINTAINED summary asset (bit-equal to a one-shot sketch by the
    * exact bottom-k merge) provides the per-group band, so the corpus
    * is scanned ONCE (the clamp pass) instead of twice, and appends
    * refresh the band delta-sized instead of re-sketching history.
    * Same pinned NULL semantics as the one-shot form.
    */
  def winsorizeFromPartials(df: DataFrame, groupCol: String,
                            partials: DataFrame, valueCol: String,
                            loPermille: Int, hiPermille: Int): DataFrame = {
    require(1 <= loPermille && loPermille < hiPermille && hiPermille <= 1000,
      s"need 1 <= lo < hi <= 1000, got ($loPermille, $hiPermille)")
    val edges = Sketches.quantileEstimates(partials, Seq(groupCol),
        Seq(loPermille, hiPermille))
      .select(col(groupCol).as("_g"), col(s"p$loPermille").as("_lo"),
        col(s"p$hiPermille").as("_hi"))
    df.join(broadcast(edges), col(groupCol) <=> col("_g"), "left")
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("_lo")), col("_hi"))))
      .drop("_g", "_lo", "_hi")
  }

  /** Equi-depth bin edges from EXISTING quantile-sketch partials —
    * the 100 TB serve path this operator's own doc promises: at scale
    * the reference edges come from the MAINTAINED summary asset
    * (q181's [[Sketches.refreshQuantileSummary]] — bit-equal to a
    * one-shot sketch by the exact bottom-k merge) instead of
    * re-sketching the reference corpus, dropping the ref cost to the
    * single bin-count pass. ONE bounded collect (nBins−1 values from
    * a ≤ k-row sketch).
    */
  def driftEdgesFromSketch(partials: DataFrame, valueCol: String,
                           nBins: Int): Seq[Double] = {
    require(nBins >= 2 && nBins <= 1000, s"nBins must be 2..1000, got $nBins")
    val pts = (1 until nBins).map(i => i * 1000 / nBins).distinct
    // headOption, not head — an empty / all-NULL reference must fail
    // diagnosably, not with a bare NoSuchElementException (ADVICE r12)
    val est = Sketches.quantileEstimates(partials, Seq.empty, pts)
      .collect().headOption
      .filter(_.getAs[Long]("n_sample") > 0L).getOrElse(
        throw new IllegalArgumentException(
          s"distributionDrift: reference side has no non-NULL " +
            s"'$valueCol' values — cannot derive bin edges from an " +
            "empty reference corpus"))
    pts.map(p => est.getAs[Number](s"p$p").doubleValue()).distinct.sorted
  }

  def distributionDrift(ref: DataFrame, cur: DataFrame, keyExpr: String,
                        valueCol: String, nBins: Int = 10,
                        k: Int = 512): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins must be 2..1000, got $nBins")
    val edges = driftEdgesFromSketch(
      Sketches.quantilePartials(ref, Seq.empty, expr(keyExpr),
        col(valueCol), k),
      valueCol, nBins)
    distributionDriftWithEdges(ref, cur, valueCol, edges)
  }

  /** The drift compare against PRECOMPUTED edges (see
    * [[driftEdgesFromSketch]]) — one linear scan per side into an
    * nBins-sized aggregate; the rate/TVD windows run over the joined
    * nBins-row table only.
    */
  def distributionDriftWithEdges(ref: DataFrame, cur: DataFrame,
                                 valueCol: String,
                                 edges: Seq[Double]): DataFrame = {
    require(edges.nonEmpty, "need at least one bin edge")
    val binCol = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col(valueCol).cast("double") > lit(e), 1).otherwise(0)
    }.cast("long")
    def binCounts(df: DataFrame, nm: String) =
      df.filter(col(valueCol).isNotNull)
        .select(binCol.as("bin")).groupBy("bin")
        .agg(count(lit(1)).as(nm))
    val w = Window.partitionBy()
    binCounts(ref, "n_ref")
      .join(binCounts(cur, "n_cur"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .withColumn("tot_ref", sum(col("n_ref")).over(w))
      .withColumn("tot_cur", sum(col("n_cur")).over(w))
      .withColumn("rate_ref_ppm", expr("n_ref * 1000000 DIV tot_ref"))
      .withColumn("rate_cur_ppm", expr("n_cur * 1000000 DIV tot_cur"))
      .withColumn("diff_ppm", abs(col("rate_ref_ppm") - col("rate_cur_ppm")))
      .withColumn("tvd_ppm", expr("sum(diff_ppm) OVER () DIV 2"))
      .drop("tot_ref", "tot_cur")
  }
}
