package graft
package ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ensemble quality scoring — the Nemotron-CC shape: several
  * independent quality scorers (a learned classifier margin, an LM
  * fluency score, a heuristic) live on INCOMPATIBLE scales, so each
  * scorer's output is first bucketed into equi-depth rank buckets
  * against its OWN score distribution, and the ensemble decision is
  * the per-document MAX bucket ("any scorer ranking the document
  * highly keeps it") gated at a bucket threshold. Everything here is
  * exact-integer and a pure function of the row multiset:
  *
  *   - the per-scorer bucket EDGES come from the bottom-k-by-md5
  *     rank sketch ([[Sketches.quantilePartials]] /
  *     [[Sketches.quantileEstimates]] — the q180 discipline), so the
  *     DuckDB oracle REBUILDS them bit-for-bit, and at 100 TB the
  *     edges serve from the maintained sketch asset instead of a
  *     fresh scan ([[Sketches.refreshQuantileSummary]]);
  *   - bucketing is a fold over the ≤ (nBuckets−1)-element edge
  *     literal — map-only, codegen'd, no window, no join (the
  *     selectUnderBudgetPruned ladder discipline);
  *   - the ensemble max + threshold is one join on the id and a
  *     greatest() — no shuffle beyond the scorer join.
  *
  * CONTRACT (inherited from the sketch): scores are integral and
  * statistically independent of md5(id)'s leading hex digits; id is
  * row-unique. NULL scores bucket to 0 (no edge is cleared) —
  * lowest quality, stated.
  */
object Ensemble {

  /** Equi-depth bucket edges of `scoreCol`'s distribution from the
    * bottom-k rank sketch: the sampled values at permille points
    * i·1000/nBuckets (i ∈ [1, nBuckets)), fetched as longs. ONE
    * bounded collect (nBuckets−1 values from a ≤ k-row sketch).
    * Duplicate edges (heavily tied score distributions) are KEPT —
    * bucket ids stay aligned to their permille points and a score
    * clearing a twice-repeated edge advances two buckets, spelled
    * identically in the oracle replay.
    */
  def bucketEdges(scored: DataFrame, idCol: String, scoreCol: String,
                  nBuckets: Int, k: Int = 512): Array[Long] =
    bucketEdgesFromPartials(
      Sketches.quantilePartials(scored, Nil, col(idCol),
        col(scoreCol), k),
      nBuckets, k, ctx = scoreCol)

  /** [[bucketEdges]] served from EXISTING sketch partials — the
    * maintained form's serve half and the 100 TB path the soak
    * motivates (ScaleSoakR17: at 30M rows the edge DERIVATION — two
    * bottom-k window sorts over the full frame — is 3× the gate
    * itself; per-ingest-segment partials merged by
    * [[Sketches.quantileMerge]] are BIT-EQUAL to the one-shot sketch
    * over the union, so the history is never re-sorted and the edges
    * are identical). The merge runs HERE (round-17 closing review:
    * estimating over an unmerged union would rank across up to
    * segments×k sample rows and silently diverge from the one-shot
    * edges — internal merging makes that misuse impossible, and is
    * idempotent on already-merged input). ONE bounded collect.
    */
  def bucketEdgesFromPartials(partials: DataFrame, nBuckets: Int,
                              k: Int = 512,
                              ctx: String = "scorer"): Array[Long] = {
    require(nBuckets >= 2 && nBuckets <= 1000,
      s"nBuckets must be 2..1000, got $nBuckets")
    val pts = (1 until nBuckets).map(i => i * 1000 / nBuckets)
    val est = Sketches.quantileEstimates(
        Sketches.quantileMerge(partials, Nil, k), Nil, pts)
      .collect().headOption.filter(_.getAs[Long]("n_sample") > 0L)
      .getOrElse(throw new IllegalArgumentException(
        s"Ensemble: no non-NULL '$ctx' scorer values — " +
          "cannot derive bucket edges from an empty scorer"))
    pts.map(p => est.getAs[Number](s"p$p").longValue()).toArray
  }

  /** bucket = #{edges : score >= edge} ∈ [0, nBuckets−1] — the
    * equi-depth rank bucket of each row against PRECOMPUTED edges
    * (a codegen'd fold over the edge literal; NULL scores clear no
    * edge and land in bucket 0).
    */
  def bucketize(scored: DataFrame, scoreCol: String, edges: Array[Long],
                outCol: String): DataFrame = {
    require(edges.nonEmpty, "need at least one bucket edge")
    scored.withColumn(outCol,
      size(filter(typedLit(edges.toSeq),
        e => col(scoreCol) >= e)).cast("long"))
  }

  /** How the per-scorer buckets fold into ONE ensemble bucket —
    * Nemotron-CC-style ensembles ship both rules (round 18, VERDICT
    * r17 Next #4): the MAX ("any scorer ranking the document highly
    * keeps it") and a weighted mean that downweights the noisier
    * scorer. Both stay exact integer on the bucket scale [0,
    * nBuckets−1], so minBucket means the same thing under either.
    */
  sealed trait Combiner

  /** ensemble bucket = greatest(buckets) — the max rule. */
  case object MaxBucket extends Combiner

  /** ensemble bucket = (Σ wᵢ·bᵢ) DIV (Σ wᵢ) — the exact-integer
    * weighted mean over the bucket VALUES (buckets are non-negative,
    * so truncating DIV is floor). Weights are per-scorer,
    * positionally aligned with the gate's bucketCols; a zero weight
    * removes that scorer from the decision (weights (1, 0) == the
    * first scorer's bucketing alone — EnsembleSpec property). The
    * mean never exceeds the max of its inputs, so the weighted gate
    * keeps a subset of the max gate's survivors at equal minBucket
    * (dominance property in EnsembleSpec). CONTRACT (round-18
    * review): bucket values are [[bucketize]]'s scale — [0, 999] by
    * the nBuckets ≤ 1000 bound — and weights are capped at 10⁹, so
    * Σ wᵢ·bᵢ stays exact in int64 up to ~9×10⁶ scorers; both are
    * REQUIREd loudly rather than wrapping silently.
    */
  final case class WeightedMeanBucket(weights: Seq[Long]) extends Combiner

  /** Weight cap keeping the weighted-mean sum exact — see
    * [[WeightedMeanBucket]].
    */
  val maxCombinerWeight = 1000000000L

  /** The ensemble decision over ALREADY-bucketed scorer columns:
    * ensemble bucket = `combiner` over the buckets, kept = ensemble
    * >= minBucket. Pure column arithmetic — composition (which
    * scorers, how they join) is the caller's. REQUIREs the output
    * columns absent from the input (ADVICE r17: withColumn silently
    * REPLACES same-named columns, so composing two gates would
    * clobber the first decision without a sound).
    */
  def gate(bucketed: DataFrame, bucketCols: Seq[String],
           minBucket: Long, combiner: Combiner = MaxBucket): DataFrame = {
    require(bucketCols.nonEmpty, "need at least one scorer bucket")
    Seq("b_ens", "kept").foreach(c =>
      require(!bucketed.columns.contains(c),
        s"Ensemble.gate: input already carries a '$c' column — " +
          "withColumn would silently replace it (composing two gates? " +
          "rename the first decision's columns before the second)"))
    val ens = combiner match {
      case MaxBucket =>
        if (bucketCols.length == 1) col(bucketCols.head)
        else greatest(bucketCols.map(col): _*)
      case WeightedMeanBucket(ws) =>
        require(ws.length == bucketCols.length,
          s"WeightedMeanBucket: ${ws.length} weights for " +
            s"${bucketCols.length} scorer buckets")
        require(ws.forall(_ >= 0L) && ws.sum > 0L,
          "WeightedMeanBucket: weights must be non-negative with a " +
            "positive sum")
        // overflow fail-closed (round-18 review): with weights ≤ 1e9
        // and bucket values ≤ 999 the weighted sum is exact in int64
        // for any realistic scorer count — past the cap it could wrap
        // SILENTLY negative and kept = b_ens >= minBucket would drop
        // rows without a sound
        require(ws.forall(_ <= maxCombinerWeight),
          s"WeightedMeanBucket: weights above $maxCombinerWeight risk " +
            "silent int64 overflow of the weighted sum — rescale them " +
            "(the mean is invariant under common scaling)")
        // DIV (not /): Column./ on longs is DOUBLE division; buckets
        // and weights are non-negative so truncation == floor. Built
        // over the column NAMES (bucketCols are names by contract),
        // backtick-quoted so any name col() accepts — spaces, dots,
        // keywords — resolves the same way under either combiner
        // (round-18 review: the unquoted spelling parsed dotted names
        // as struct access).
        val terms = bucketCols.zip(ws)
          .map { case (c, w) =>
            require(!c.contains("`"),
              s"WeightedMeanBucket: backtick in column name '$c'")
            s"`$c` * ${w}L"
          }.mkString(" + ")
        expr(s"CAST(($terms) DIV ${ws.sum}L AS BIGINT)")
    }
    bucketed
      .withColumn("b_ens", ens)
      .withColumn("kept", col("b_ens") >= lit(minBucket))
  }

  /** [[gate]] under the max rule — the q286–q290 family's spelling. */
  def maxGate(bucketed: DataFrame, bucketCols: Seq[String],
              minBucket: Long): DataFrame =
    gate(bucketed, bucketCols, minBucket, MaxBucket)
}
