package graft
package ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.TextAnalysis._

/** Deduplication operators, from exact keyed dedup (the reference's
  * upsert semantics, SURVEY.md §2.3 D1–D3) up to the near-duplicate
  * families a training-data pipeline needs (MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding cosine).
  *
  * Scale posture (100 TB): every near-dup operator is built
  * candidate-generation-first — documents are bucketed by a short key
  * (minhash band, simhash band, shared shingle) and only bucket-mates
  * are compared, so the quadratic all-pairs step never materializes on
  * the full corpus. The candidate joins are plain equi-joins on the
  * bucket key, which Spark shuffles by key — skew in a hot bucket is
  * handled by AQE skew-join splitting.
  */
object Dedup {

  /** Exact duplicate groups by content hash: one row per distinct
    * content, with the keeper (min id) and the duplicate count.
    * (SURVEY.md §2.3 D3: the reference keys on md5 exactly like this.)
    */
  def exactGroups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_key"))
      .agg(
        min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_copies"))

  /** Span-level (token-block) dedup — the "deduplicating training
    * data makes language models better" (Lee et al. 2022) exact
    * repeated-substring removal, at fixed block granularity (the form
    * that scales: C4 does the same with three-sentence spans). Each
    * document's tokens are cut into consecutive `spanTokens`-token
    * blocks; a block whose text occurs >= `minRepeat` times across
    * the WHOLE corpus is dropped everywhere except its first
    * occurrence (min (doc_id, pos) — boilerplate headers/footers
    * survive exactly once, unique content is untouched). Returns
    * (doc_id, n_blocks, n_kept, text_dedup) with text_dedup the
    * kept blocks rejoined in document order.
    *
    * Scale shape: one explode (corpus/spanTokens rows), one
    * partial+final count aggregate on the block text, a join back on
    * the block, one groupBy doc_id for reassembly — all linear, no
    * self-joins. Contract: doc ids nonnegative and < 2^43 and docs
    * shorter than 10^6 blocks (the (doc_id, pos) keeper key is
    * integer-encoded as doc_id*1e6+pos so the argmin is a plain
    * int64 min in any engine). The contract is ENFORCED in-plan: a
    * violating row raises a runtime error instead of silently
    * corrupting first-occurrence selection (ADVICE r4).
    */
  def dropRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                        spanTokens: Int, minRepeat: Long,
                        mat: Materializer = Materialize.LocalLazy): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    require(minRepeat >= 2, s"minRepeat must be >= 2, got $minRepeat")
    // the block table feeds three plan branches (count aggregate,
    // join-back, per-doc totals) — materialize once or the corpus is
    // re-tokenized and re-exploded per branch (same barrier rationale
    // as minhashLshPairs)
    val blk = mat(spanBlocks(docs, idCol, textCol, spanTokens))
    val stats = blk.groupBy($"blk").agg(
      count(lit(1)).as("cnt"),
      min($"key").as("keeper"))
    reassembleSpans(blk, stats, minRepeat)
  }

  /** The (doc_id, pos, blk, key) block table of [[dropRepeatedSpans]]:
    * consecutive `spanTokens`-token blocks per document, with the
    * contract-guarded integer keeper key. Shared with the incremental
    * streaming path ([[graft.streaming.StreamingUpsert]]) so batch and
    * stream cut IDENTICAL blocks.
    */
  private[graft] def spanBlocks(docs: DataFrame, idCol: String,
                                textCol: String, spanTokens: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.toks(col(textCol)).as("toks"))
      .filter(size($"toks") > 0)
      .select($"doc_id", posexplode(
        transform(
          sequence(lit(1), expr(s"(size(toks) + ${spanTokens - 1}) DIV $spanTokens")),
          i => concat_ws(" ",
            slice($"toks", (i - lit(1)) * lit(spanTokens) + lit(1),
              lit(spanTokens))))))
      .select($"doc_id", ($"pos" + 1).cast("long").as("pos"),
        $"col".as("blk"))
      // guarded keeper key: encoding is only injective for
      // 0 <= doc_id < 2^43 and pos < 1e6 — fail loudly past the bounds
      // (raise_error sits in the otherwise-branch of a column every
      // consumer reads, so it cannot be pruned away)
      .withColumn("key",
        when($"doc_id" >= 0L && $"doc_id" < lit(1L << 43) &&
          $"pos" < 1000000L, $"doc_id" * lit(1000000L) + $"pos")
          .otherwise(raise_error(concat(
            lit("dropRepeatedSpans contract violated: need 0 <= doc_id < 2^43 "
              + "and < 1e6 blocks/doc, got (doc_id="),
            $"doc_id", lit(", pos="), $"pos", lit(")")))))

  /** Join a block table against per-block stats (blk, cnt, keeper),
    * drop repeated non-keeper blocks, and reassemble per-doc output —
    * the shared tail of [[dropRepeatedSpans]] and the streaming
    * reconstruction.
    */
  private[graft] def reassembleSpans(blk: DataFrame, stats: DataFrame,
                                     minRepeat: Long): DataFrame = {
    val kept = blk.join(stats, Seq("blk"))
      .filter($"cnt" < minRepeat || $"key" === $"keeper")
    val nb = blk.groupBy($"doc_id").agg(count(lit(1)).as("n_blocks"))
    val ko = kept.groupBy($"doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct($"pos", $"blk"))),
        s => s.getField("blk"))).as("text_dedup"))
    nb.join(ko, Seq("doc_id"), "left")
      .select($"doc_id", $"n_blocks",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"text_dedup", lit("")).as("text_dedup"))
  }

  /** Last-write-wins keyed dedup (SURVEY.md §2.3 D2): latest row per
    * key by (orderCol desc, idCol desc) — the Mongo-upsert / ES-doc-id
    * semantics of the reference.
    *
    * Implemented as a max_by AGGREGATION, not a window: a row_number
    * window must co-locate and sort every row of a key in one task, so
    * one hot key (billions of updates to one document) stalls the
    * stage at 100 TB. max_by is a partial+final aggregate — map-side
    * combine reduces each partition's contribution to one row per key
    * before the shuffle, making the operator skew-immune. Keeper choice
    * is identical to the window form: lexicographic max of
    * (orderCol, idCol), assuming orderCol/idCol are non-null.
    */
  def lastWriteWins(df: DataFrame, keyCol: String, orderCol: String,
                    idCol: String): DataFrame = {
    val cols = df.columns.toIndexedSeq
    df.groupBy(col(keyCol))
      .agg(max_by(struct(cols.map(col): _*),
        struct(col(orderCol), col(idCol))).as("_row"))
      .select(cols.map(c => col("_row").getField(c).as(c)): _*)
  }

  /** Window-based LWW — the same semantics via row_number, kept for
    * contexts that need rank exposure. Prefer [[lastWriteWins]] (the
    * aggregate form) for batch dedup at scale; see its scale note.
    */
  def lastWriteWinsWindow(df: DataFrame, keyCol: String, orderCol: String,
                          idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc, col(idCol).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Distinct word n-gram shingle set per document. Native expression
    * ([[graft.plans.Native.distinctShingles]]): output is identical to
    * `array_distinct(shingles(toks, n))` but evaluated in one compiled
    * pass — the interpreted HOF chain was the dominant cost of every
    * shingle-based operator (measured 5.4s -> <1s over sf0.1 docs).
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.plans.Native.distinctShingles(toks(col(textCol)), n).as("shs"))

  /** Exact n-gram Jaccard near-dup pairs: candidate pairs share at
    * least one RARE shingle (document frequency <= maxDf) via an
    * inverted-index equi-join — never all-pairs — then the candidates
    * are verified with the exact Jaccard over the FULL shingle sets:
    * |A∩B| / (|A|+|B|-|A∩B|) from exact integer counts.
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= tau.
    *
    * The df cap is the standard skew guard: one hot shingle (a common
    * 5-word phrase) would otherwise contribute O(df²) candidate pairs
    * and make the hottest bucket quadratic at corpus scale. Pairs whose
    * ONLY shared shingles are hot ones are missed by construction —
    * that is the documented trade; route through [[minhashLshPairs]]
    * when probabilistic recall guarantees are needed at 100 TB.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, tau: Double, maxDf: Long = 1000L,
                        mat: Materializer = Materialize.LocalLazy): DataFrame = {
    // Same materialization barriers as minhashLshPairs: the shingle
    // table feeds the inverted index AND both verify probes, and the
    // capped index feeds both sides of the candidate self-join —
    // without them every branch re-tokenizes the corpus.
    val sets = mat(shingleSets(docs, idCol, textCol, n))
    rareShingleCandidates(sets, maxDf, mat)
      .select($"doc_a", $"doc_b",
        ($"inter".cast("double") / ($"na" + $"nb" - $"inter").cast("double"))
          .as("jaccard"))
      .filter($"jaccard" >= tau)
  }

  /** Shared candidate chain of [[ngramJaccardPairs]] and
    * [[containmentPairs]]: pairs sharing a RARE shingle (df <= maxDf)
    * via the inverted-index self-join, verified with ONE exact
    * intersect over the full sets (staged so the expensive
    * intersection is computed once per candidate, not once per
    * reference in the score formula). Returns
    * (doc_a, doc_b, inter, na, nb), doc_a &lt; doc_b.
    */
  private def rareShingleCandidates(sets: DataFrame, maxDf: Long,
                                    mat: Materializer): DataFrame = {
    val inv = sets.select($"doc_id", explode($"shs").as("sh"))
    val rare = inv.groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" <= maxDf).select($"sh")
    val cinv = mat(inv.join(rare, Seq("sh")))
    cinv.as("a").join(cinv.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .join(sets.as("sa"), $"doc_a" === col("sa.doc_id"))
      .join(sets.as("sb"), $"doc_b" === col("sb.doc_id"))
      .select($"doc_a", $"doc_b",
        size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("long").as("inter"),
        size(col("sa.shs")).cast("long").as("na"),
        size(col("sb.shs")).cast("long").as("nb"))
  }

  /** CONTAINMENT near-dup pairs — the ASYMMETRIC overlap Jaccard
    * misses: cont(A→B) = |A∩B| / |A|. A short document quoted whole
    * inside a long one has cont(short→long) ≈ 1 while its Jaccard is
    * tiny (the union is long-document-sized), so a Jaccard-thresholded
    * dedup keeps both copies; production corpus pipelines run a
    * containment pass for exactly this subset/quote case (RefinedWeb,
    * Dolma). Same candidate shape as [[ngramJaccardPairs]] (shared
    * RARE shingle via the df-capped inverted index — one hot phrase
    * must not go O(df²); pairs sharing ONLY hot shingles are missed,
    * the same documented trade, with [[minhashLshPairs]] as the
    * probabilistic-recall route), then candidates verify with the
    * exact intersect over FULL shingle sets.
    *
    * Scores are exact integer ppm (inter × 10⁶ DIV size — truncating,
    * engine-portable), BOTH directions reported, pair kept when
    * either direction reaches `tauPpm`. Returns (doc_a, doc_b, inter,
    * na, nb, cont_a_ppm, cont_b_ppm) with doc_a &lt; doc_b.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, tauPpm: Long, maxDf: Long = 1000L,
                       mat: Materializer = Materialize.LocalLazy): DataFrame = {
    require(tauPpm >= 1L && tauPpm <= 1000000L,
      s"tauPpm must be 1..1000000, got $tauPpm")
    require(maxDf >= 1L, s"maxDf must be >= 1, got $maxDf")
    val sets = mat(shingleSets(docs, idCol, textCol, n))
    rareShingleCandidates(sets, maxDf, mat)
      .select($"doc_a", $"doc_b", $"inter", $"na", $"nb",
        expr("inter * 1000000 DIV na").as("cont_a_ppm"),
        expr("inter * 1000000 DIV nb").as("cont_b_ppm"))
      .filter(greatest($"cont_a_ppm", $"cont_b_ppm") >= tauPpm)
  }

  /** Exact set-Jaccard near-dup pairs over PRECOMPUTED item sets
    * (doc_id, shs: array&lt;string&gt;) — [[ngramJaccardPairs]]' df-capped
    * candidate+verify chain with the SET pluggable, the same factoring
    * [[hammingPairs]] gives the 64-bit hash family: any
    * set-of-fingerprints representation reuses it. The video near-dup
    * chain is the motivating caller (items = per-frame perceptual
    * hashes from [[Media.dhashGifFrames]] — clip similarity as frame-
    * set overlap survives re-encode, frame drops and re-ordering).
    * Scores in exact integer ppm (inter × 10⁶ DIV union — truncating,
    * engine-portable). Returns (doc_a, doc_b, inter, na, nb, jac_ppm),
    * doc_a &lt; doc_b, jac_ppm ≥ tauPpm. Same documented df-cap trade
    * as [[ngramJaccardPairs]]: pairs sharing ONLY hot items (df &gt;
    * maxDf) are missed — one viral frame must not go O(df²).
    *
    * Scale shape: inverted index + df cap + equi self-join on the
    * item; ONE exact array_intersect per candidate; empty sets are
    * dropped (nothing to compare, and they would pair quadratically).
    */
  def setJaccardPairs(sets: DataFrame, tauPpm: Long,
                      maxDf: Long = 1000L,
                      mat: Materializer = Materialize.LocalLazy): DataFrame = {
    require(tauPpm >= 1L && tauPpm <= 1000000L,
      s"tauPpm must be 1..1000000, got $tauPpm")
    require(maxDf >= 1L, s"maxDf must be >= 1, got $maxDf")
    val s = mat(sets.select($"doc_id", array_distinct($"shs").as("shs"))
      .filter(size($"shs") > 0))
    rareShingleCandidates(s, maxDf, mat)
      .select($"doc_a", $"doc_b", $"inter", $"na", $"nb",
        expr("inter * 1000000 DIV (na + nb - inter)").as("jac_ppm"))
      .filter($"jac_ppm" >= tauPpm)
  }

  /** EXACT n-gram Jaccard similarity join via prefix filtering (the
    * AllPairs / PPJoin family: Bayardo et al., "Scaling Up All Pairs
    * Similarity Search", WWW'07; Xiao et al., "Efficient Similarity
    * Joins for Near Duplicate Detection", WWW'08). Unlike
    * [[ngramJaccardPairs]] (df-capped candidates — pairs sharing only
    * hot shingles are missed by construction) this returns EVERY pair
    * with jaccard >= tau, yet never indexes a document's full shingle
    * set:
    *
    * Order each document's shingles by a global canonical order
    * (ascending document frequency, rarest first; ties by value) and
    * index only the first |s| - ceil(tau*|s|) + 1 of them. By the
    * prefix-filtering principle, any pair at jaccard >= tau must share
    * a shingle within both prefixes — if all shared shingles sat past
    * A's prefix, the overlap would be < tau*|A| <= tau*|A union B|.
    *
    * Scale shape: df attach is an equi-join on the shingle, the
    * per-document prefix sort is a bounded per-key window (shingle
    * sets are document-sized, never corpus-sized), the candidate join
    * is an equi-join on prefix shingles — rarest-first ordering makes
    * prefix shingles the LOW-df ones, so bucket sizes shrink exactly
    * where the naive index explodes. Verification is the same exact
    * intersect as q22. Cost rises as tau falls (prefixes lengthen);
    * at dedup-grade tau (>= 0.4) the index is a fraction of the corpus.
    *
    * Measured guidance (PROFILE.md scaling soak): prefix filtering
    * bounds the INDEX, but total cost still tracks the true
    * candidate-pair count (Sigma df^2 over shared shingles) — use
    * [[minhashLshPairs]]/[[simhashPairs]] for web-scale near-dup
    * density; this operator is for exactness requirements at moderate
    * density or high tau.
    */
  def jaccardPairsExact(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, tau: Double,
                        mat: Materializer = Materialize.LocalLazy): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    val sets = mat(shingleSets(docs, idCol, textCol, n)
      .filter(size($"shs") > 0))
    val inv = sets.select($"doc_id", explode($"shs").as("sh"))
    val dfs = inv.groupBy($"sh").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"df".asc, $"sh".asc)
    // prefix length |s| - ceil(tau*|s|) + 1, with |s| from a size join
    val sizes = sets.select($"doc_id", size($"shs").cast("long").as("sz"))
    val prefix = inv.join(dfs, Seq("sh"))
      .withColumn("pos", row_number().over(w))
      .join(sizes, Seq("doc_id"))
      .filter($"pos" <= $"sz" - ceil(lit(tau) * $"sz") + lit(1))
      .select($"doc_id", $"sh")
    val prefixM = mat(prefix)
    val cands = prefixM.as("a").join(prefixM.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(sets.as("sa"), $"doc_a" === col("sa.doc_id"))
      .join(sets.as("sb"), $"doc_b" === col("sb.doc_id"))
      .select($"doc_a", $"doc_b",
        size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("long").as("inter"),
        size(col("sa.shs")).cast("long").as("na"),
        size(col("sb.shs")).cast("long").as("nb"))
      .select($"doc_a", $"doc_b",
        ($"inter".cast("double") / ($"na" + $"nb" - $"inter").cast("double"))
          .as("jaccard"))
      .filter($"jaccard" >= tau)
  }

  // ------------------------------------------------------------ MinHash
  /** MinHash signature columns (the composed executable spec of the
    * native band-key pipeline; property-tested equal in NativeSpec):
    * v = int of the first 15 hex chars of md5(shingle), sig_i = min
    * over shingles of (a_i * (v mod p) + b_i) mod p with p = 2^31-1
    * and md5-derived (a_i, b_i) — the universal-hash min-hash family
    * (Broder, "On the resemblance and containment of documents", 1997;
    * same family as Spark MLlib's MinHashLSH). ONE digest per shingle;
    * every intermediate stays under 2^62, exact int64 in any engine.
    */
  def withMinhashSignature(sets: DataFrame, numHashes: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.{MinhashBandKeys, ShingleUtil}
    val cs = MinhashBandKeys.hashConsts(numHashes)
    val p = ShingleUtil.minhashP
    // one projection, not numHashes chained withColumns — each
    // withColumn copies and re-analyzes the whole plan (quadratic
    // driver cost at realistic 128-hash signatures)
    val vm = (sh: Column) =>
      pmod(conv(substring(md5(sh), 1, 15), 16, 10).cast("long"), lit(p))
    val sigCols = cs.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform($"shs", sh =>
        pmod(lit(a) * vm(sh) + lit(b), lit(p))))
        .as(s"sig$i")
    }
    sets.select(col("*") +: sigCols: _*)
  }

  /** Default band-bucket population cap for the LSH candidate joins —
    * the same magnitude as [[ngramJaccardPairs]]'s default `maxDf`.
    * Shared with the generated oracle SQL so the two sides cannot
    * drift.
    */
  val defaultMaxBucket: Long = 1000L

  /** Raw (uncapped) minhash band buckets for `sets` (doc_id, shs):
    * one row per (doc, band) with the band's bucket key.
    */
  private[graft] def minhashBuckets(sets: DataFrame, bands: Int,
                                    rowsPerBand: Int): DataFrame =
    sets
      .select($"doc_id", posexplode(
        graft.plans.Native.minhashBandKeys($"shs", bands, rowsPerBand)))
      .select($"doc_id", $"pos".as("band"), $"col".as("bkey"))

  /** Keep only (band, bkey) buckets with population <= maxBucket —
    * the quadratic-candidate guard (see [[minhashLshPairs]]).
    */
  private[graft] def capBuckets(buckets: DataFrame, maxBucket: Long): DataFrame = {
    val ok = buckets.groupBy($"band", $"bkey")
      .agg(count(lit(1)).as("pop"))
      .filter($"pop" <= maxBucket)
      .select($"band", $"bkey")
    buckets.join(ok, Seq("band", "bkey"))
  }

  /** MinHash + LSH banded near-dup pairs: signatures are split into
    * `bands` bands of `rowsPerBand`; documents colliding in any band
    * become candidates; candidates are verified with the exact shingle
    * Jaccard and kept when >= tau. Output (doc_a, doc_b, jaccard).
    *
    * This is the 100 TB path: cost is O(corpus x bands) for bucketing
    * plus the (tiny) verified-candidate join, not O(corpus^2).
    *
    * `maxBucket` caps band-bucket POPULATION: a degenerate corpus
    * region (thousands of near-identical boilerplate docs — the common
    * case in web-crawl dedup) lands whole cohorts in one band bucket,
    * and the candidate self-join would go O(m²) in that bucket before
    * verification — AQE skew-split rebalances partitions but cannot
    * reduce the pair count. Buckets over the cap are DROPPED from
    * candidate generation (the q22 `maxDf` pattern); pairs whose only
    * shared buckets are over-cap are missed by construction — that is
    * the documented recall trade, quantified per-corpus by
    * [[lshBucketStats]]. EXACT duplicates are the cheap case this cap
    * deliberately routes elsewhere: find them first with
    * [[exactGroups]] (as [[CleanCorpus.clean]] does) so only true
    * near-dups reach the LSH stage.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, bands: Int, rowsPerBand: Int,
                      tau: Double, maxBucket: Long = defaultMaxBucket,
                      mat: Materializer = Materialize.LocalLazy): DataFrame = {
    require(maxBucket >= 1L, s"maxBucket must be >= 1, got $maxBucket")
    // The shingle table feeds three plan branches (bucketing + both
    // verify probes) and the bucket table feeds both sides of the
    // candidate self-join. Without a materialization barrier every
    // branch re-tokenizes and re-hashes the whole corpus (a broadcast
    // self-join defeats ReusedExchange). The barrier mechanism is the
    // caller's Materializer: local checkpoint on local[*], reliable
    // checkpoint / persisted signature table at cluster scale.
    val sets = mat(shingleSets(docs, idCol, textCol, n)
      .filter(size($"shs") > 0))
    // Band keys come from ONE fused native expression consumed once by
    // posexplode (sig_i = universal-hash min over one md5 per shingle,
    // bkey = md5 over the band's decimal-rendered sigs — identical to
    // the withMinhashSignature + band-md5 composition). The RAW bucket
    // table is materialized before capping: the population aggregate
    // and the join-back both read it, and re-running the fused hash
    // expression per consumer measurably dominates (bench q23).
    val rawBuckets = mat(minhashBuckets(sets, bands, rowsPerBand))
    val buckets = mat(capBuckets(rawBuckets, maxBucket))
    lshVerifiedPairs(sets, buckets, tau)
  }

  /** Candidate self-join + exact-Jaccard verification over a (capped)
    * band-bucket table — the shared tail of [[minhashLshPairs]] and
    * [[minhashLshPairsFromTable]]. `sets` must carry (doc_id, shs),
    * `buckets` (doc_id, band, bkey).
    */
  private def lshVerifiedPairs(sets: DataFrame, buckets: DataFrame,
                               tau: Double): DataFrame = {
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val verified = cands
      .join(sets.as("sa"), $"doc_a" === col("sa.doc_id"))
      .join(sets.as("sb"), $"doc_b" === col("sb.doc_id"))
      .select($"doc_a", $"doc_b",
        size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("long").as("inter"),
        size(col("sa.shs")).cast("long").as("na"),
        size(col("sb.shs")).cast("long").as("nb"))
      .select($"doc_a", $"doc_b",
        ($"inter".cast("double") / ($"na" + $"nb" - $"inter").cast("double"))
          .as("jaccard"))
    verified.filter($"jaccard" >= tau)
  }

  /** Persist the LSH dedup assets as BUCKETED catalog tables — the
    * batch counterpart of the streaming path's persisted signature
    * tables ([[graft.streaming.StreamingUpsert.incrementalNearDup]]).
    * Pay the shingle/minhash computation and the shuffle ONCE at
    * write time; every later [[minhashLshPairsFromTable]] run reads
    * them back with the hash distribution already on disk:
    *   - `setsTable` (doc_id, shs) bucketed by doc_id — the verify
    *     probes read it pre-distributed;
    *   - `bucketsTable` (doc_id, band, bkey) bucketed by (band, bkey)
    *     — the candidate self-join and the population-cap aggregate
    *     both key on exactly the bucket columns, so neither plans an
    *     Exchange (asserted in PlanSpec).
    * The bucket table is derived from the PERSISTED sets table, so
    * document text is tokenized and hashed exactly once. At 100 TB
    * this is the repeat-dedup asset: incremental corpus drops re-run
    * candidate generation against unchanged signatures instead of
    * re-hashing the corpus.
    */
  def writeLshAssets(docs: DataFrame, idCol: String, textCol: String,
                     n: Int, bands: Int, rowsPerBand: Int,
                     setsTable: String, bucketsTable: String,
                     numBuckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    Tables.writeBucketed(
      shingleSets(docs, idCol, textCol, n).filter(size($"shs") > 0),
      setsTable, Seq("doc_id"), numBuckets)
    Tables.writeBucketed(
      minhashBuckets(spark.table(setsTable), bands, rowsPerBand),
      bucketsTable, Seq("band", "bkey"), numBuckets)
  }

  /** [[minhashLshPairs]] over assets persisted by [[writeLshAssets]]:
    * identical output (same cap, same verification) with no shingle
    * or minhash computation at query time, and a zero-Exchange
    * candidate self-join (the band-bucket table's bucketing IS the
    * join distribution).
    */
  def minhashLshPairsFromTable(spark: org.apache.spark.sql.SparkSession,
                               setsTable: String, bucketsTable: String,
                               tau: Double,
                               maxBucket: Long = defaultMaxBucket): DataFrame = {
    require(maxBucket >= 1L, s"maxBucket must be >= 1, got $maxBucket")
    val sets = spark.table(setsTable)
    val buckets = capBuckets(spark.table(bucketsTable), maxBucket)
    lshVerifiedPairs(sets, buckets, tau)
  }

  /** Audit of the minhash band buckets against a population cap: ONE
    * row (n_buckets, n_dropped_buckets, n_docs_in_dropped) — the
    * dropped-bucket exposure a production run records next to its
    * [[minhashLshPairs]] output so the `maxBucket` recall trade is
    * measured, not assumed. Linear: one bucketing pass + one
    * two-level aggregate.
    */
  def lshBucketStats(docs: DataFrame, idCol: String, textCol: String,
                     n: Int, bands: Int, rowsPerBand: Int,
                     maxBucket: Long): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, n)
      .filter(size($"shs") > 0)
    minhashBuckets(sets, bands, rowsPerBand)
      .groupBy($"band", $"bkey").agg(count(lit(1)).as("pop"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when($"pop" > maxBucket, 1L).otherwise(0L))
          .as("n_dropped_buckets"),
        sum(when($"pop" > maxBucket, $"pop").otherwise(0L))
          .as("n_docs_in_dropped"))
  }


  /** Cross-corpus n-gram contamination check (train-set
    * DEcontamination): pairs of (left doc, right doc) sharing at least
    * `minShared` distinct n-gram shingles — e.g. training documents
    * overlapping an evaluation benchmark. Candidates come from an
    * inverted-index equi-join on shingles rare on the RIGHT side
    * (df <= maxDf; the benchmark corpus is the small one), then the
    * shared count is verified exactly over the full shingle sets.
    * Never all-pairs; linear in both corpora.
    */
  def crossContamination(left: DataFrame, lId: String, lText: String,
                         right: DataFrame, rId: String, rText: String,
                         n: Int, maxDf: Long, minShared: Int,
                         mat: Materializer = Materialize.LocalLazy): DataFrame = {
    // Each side's shingle table feeds its inverted index and a verify
    // probe — materialize once per side (see minhashLshPairs).
    val lSets = mat(shingleSets(left, lId, lText, n)
      .select($"doc_id".as("left_id"), $"shs".as("l_shs")))
    val rSets = mat(shingleSets(right, rId, rText, n)
      .select($"doc_id".as("right_id"), $"shs".as("r_shs")))
    val rInv = rSets.select($"right_id", explode($"r_shs").as("sh"))
    val rRare = rInv.groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" <= maxDf).select($"sh")
    val rInvCapped = rInv.join(rRare, Seq("sh"))
    val lInv = lSets.select($"left_id", explode($"l_shs").as("sh"))
    val cands = lInv.join(rInvCapped, Seq("sh"))
      .select($"left_id", $"right_id").distinct()
    cands
      .join(lSets, Seq("left_id"))
      .join(rSets, Seq("right_id"))
      .select($"left_id", $"right_id",
        size(array_intersect($"l_shs", $"r_shs")).cast("long").as("n_shared"))
      .filter($"n_shared" >= minShared)
  }

  // --------------------------------------------------------- clustering
  /** Connected components over an undirected pair list via the
    * ALTERNATING large-star / small-star algorithm (Kiveris, Lattanzi,
    * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
    * MapReduce and Beyond", SoCC'14): O(log² n) rounds worst-case and
    * ~log₂(diameter) in practice, vs O(diameter) for plain min-label
    * propagation — near-dup chains (boilerplate gradients A~B~C~…)
    * produce high-diameter components at corpus scale, which is
    * exactly where propagation stalls.
    *
    * Each round is ONE Spark job: the convergence test (edge count +
    * new-edge count vs the previous round) is folded into the same
    * aggregate action that materializes the round's cache — no
    * separate isEmpty/count job. Edges are kept canonical (u > v)
    * throughout; both star operations emit (bigger, smaller) by
    * construction, so no re-canonicalization shuffle is needed.
    *
    * Per round: large-star connects every node's LARGER neighbors to
    * the minimum of its closed neighborhood; small-star connects the
    * smaller neighbors (and the node itself) to that minimum. Both
    * preserve connectivity; the fixpoints are exactly the star graphs
    * rooted at each component's minimum id (the paper's Lemma 1-3), so
    * on convergence every non-root carries one edge to its component
    * min.
    *
    * Returns (labels, rounds): labels = (id, lbl = component min id).
    */
  def connectedComponentsWithRounds(pairs: DataFrame, maxRounds: Int = 64,
      mat: Materializer = Materialize.LocalLazy): (DataFrame, Int) = {
    val base = mat(pairs.select(
        greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter($"u" =!= $"v").distinct())
    // single consumer (the final left join) — no barrier needed
    val nodes = base.select($"u".as("id"))
      .unionByName(base.select($"v".as("id"))).distinct()
    var edges = base
    var prevCount = -1L
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      rounds += 1
      // large-star: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
      // Output is canonical: v > u >= m.
      val sym = edges.select($"u", $"v")
        .unionByName(edges.select($"v".as("u"), $"u".as("v")))
      val lmin = sym.groupBy($"u").agg(min($"v").as("mv"))
        .select($"u", least($"u", $"mv").as("m"))
      val ls = sym.join(lmin, Seq("u")).filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .distinct()
      // small-star over the (max → min)-directed ls: m = min(Γ(u) ∪
      // {u}) = min(Γ(u)); emit (v, m) for v ∈ Γ(u) \ {m}, plus (u, m).
      // Output is canonical: every emitted left side exceeds m.
      val smin = ls.groupBy($"u").agg(min($"v").as("m"))
      val ss = ls.join(smin, Seq("u"))
        .select($"v".as("u2"), $"m").filter($"u2" =!= $"m")
        .unionByName(smin.select($"u".as("u2"), $"m"))
        .select($"u2".as("u"), $"m".as("v"))
        .distinct()
      // ONE action per round: `iterative` is a LAZY lineage-truncating
      // barrier, so the aggregate below both materializes the round
      // frame and returns (edge count, edges-not-in-previous count).
      // Both sets are distinct and canonical, so equal counts + no new
      // edges <=> the round was a fixpoint (= a star forest, per the
      // paper).
      val next = mat.iterative(ss.join(
          edges.select($"u", $"v").withColumn("_old", lit(1)),
          Seq("u", "v"), "left"))
      val row = next.agg(count(lit(1)).as("cnt"),
        sum(when($"_old".isNull, 1L).otherwise(0L)).as("n_new")).head()
      val cnt = row.getLong(0)
      val nNew = if (row.isNullAt(1)) 0L else row.getLong(1)
      done = nNew == 0L && cnt == prevCount
      prevCount = cnt
      edges = next.select($"u", $"v")
    }
    if (!done) throw new IllegalStateException(
      s"connected components did not converge in $maxRounds rounds")
    // star edges point every non-root at its component minimum
    val labels = nodes.join(
        edges.select($"u".as("id"), $"v".as("lbl")), Seq("id"), "left")
      .select($"id", coalesce($"lbl", $"id").as("lbl"))
    (labels, rounds)
  }

  /** Duplicate clusters from a near-dup pair list: one row per document
    * appearing in any pair — (doc_id, cluster_id = min doc id in its
    * component, is_keeper = this doc is that minimum), the "keep one
    * copy per duplicate group" decision a dedup pipeline actually
    * needs. Components via [[connectedComponentsWithRounds]].
    */
  def duplicateClusters(pairs: DataFrame,
      mat: Materializer = Materialize.LocalLazy): DataFrame = {
    val (labels, _) = connectedComponentsWithRounds(pairs, mat = mat)
    labels.select($"id".as("doc_id"), $"lbl".as("cluster_id"),
      ($"lbl" === $"id").as("is_keeper"))
  }

  /** Incrementally maintain component labels under an edge DELTA — the
    * maintenance swap for rerunning [[connectedComponentsWithRounds]]
    * over the full pair list. At 100 TB the dedup graph is
    * crawl-cumulative: each ingest batch adds a sliver of new pairs,
    * and a full CC rerun pays O(log n) shuffle rounds over ALL edges
    * for a delta that touches a handful of components.
    *
    * This form recomputes ONLY the touched slice. `prevLabels` is a
    * prior labeling (id, lbl = component min — the CC fixpoint, which
    * is also a lossless star-forest encoding of the prior
    * connectivity: component-wise, the star edges connect exactly what
    * the original edges connected). Steps:
    *
    *   1. components hit by the delta = prev labels of delta endpoints
    *      (delta-sized; BROADCAST);
    *   2. their full membership via one broadcast-hash join against
    *      prevLabels — scan-only over the corpus-sized side, no
    *      shuffle of it;
    *   3. CC over (affected star edges) ∪ (delta) — an
    *      affected+delta-sized problem whose star-forest part has
    *      depth 1, so the loop converges in O(log affected-components)
    *      rounds independent of the ORIGINAL graph's diameter;
    *   4. untouched labels pass through via the same broadcast as an
    *      anti-join.
    *
    * Result == [[connectedComponentsWithRounds]] on (prior edges ∪
    * delta), exactly — merges ACROSS prior components re-label whole
    * components to the new global min (DedupSpec property vs the batch
    * run on random graphs/splits). Empty delta returns prevLabels
    * unchanged; brand-new ids appear with their delta component.
    */
  def ccIncremental(prevLabels: DataFrame, deltaPairs: DataFrame,
      mat: Materializer = Materialize.LocalLazy): DataFrame = {
    val delta = mat(deltaPairs.select(
        greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter($"u" =!= $"v").distinct())
    val prev = prevLabels.select($"id", $"lbl")
    val touched = delta.select($"u".as("id"))
      .unionByName(delta.select($"v".as("id"))).distinct()
    val hitLbls = mat(prev.join(touched, Seq("id"))
      .select($"lbl").distinct())
    val affected = prev.join(broadcast(hitLbls), Seq("lbl"))
    val subPairs = affected.filter($"id" =!= $"lbl")
      .select($"id".as("doc_a"), $"lbl".as("doc_b"))
      .unionByName(delta.select($"u".as("doc_a"), $"v".as("doc_b")))
    val (sub, _) = connectedComponentsWithRounds(subPairs, mat = mat)
    // delta-only singletons (u === v pairs filtered at intake) cannot
    // occur, and every affected member reaches subPairs: multi-node
    // components through their star edges, touched singletons through
    // the delta edge that touched them — so kept ∪ sub partitions the
    // node set.
    prev.join(broadcast(hitLbls), Seq("lbl"), "left_anti")
      .select($"id", $"lbl")
      .unionByName(sub.select($"id", $"lbl"))
  }

  /** [[duplicateClusters]] served incrementally: prior cluster table +
    * new near-dup pairs → the updated (doc_id, cluster_id, is_keeper)
    * decision, via [[ccIncremental]]. Results-invisible vs the batch
    * operator on the full pair list (q187 runs under q49's oracle).
    */
  def duplicateClustersIncremental(prevClusters: DataFrame,
      deltaPairs: DataFrame,
      mat: Materializer = Materialize.LocalLazy): DataFrame =
    ccIncremental(
        prevClusters.select($"doc_id".as("id"), $"cluster_id".as("lbl")),
        deltaPairs, mat)
      .select($"id".as("doc_id"), $"lbl".as("cluster_id"),
        ($"lbl" === $"id").as("is_keeper"))

  // ------------------------------------------------------------ SimHash
  /** SimHash near-dup pairs at Hamming distance <= maxDist on a 64-bit
    * fingerprint. Candidates come from banding the fingerprint into
    * (maxDist+1) bands — by pigeonhole, any pair within maxDist collides
    * on at least one whole band, so banding loses nothing and keeps the
    * join linear in the corpus. Remainder bits (when maxDist+1 doesn't
    * divide 64) are spread one-per-band across the leading bands so
    * every fingerprint bit lands in exactly one band.
    *
    * Scale note: band selectivity is 2^bandLen buckets; maxDist <= 3
    * keeps bandLen >= 16 (>= 65k buckets/band), which is what a >= 1e8
    * document corpus needs. maxDist is capped at 7 (bandLen 8) — beyond
    * that the buckets are too coarse to prune anything.
    *
    * `maxBucket` caps band-bucket population exactly like
    * [[minhashLshPairs]] — same quadratic-candidate guard, same
    * documented recall trade (route exact duplicates through
    * [[exactGroups]] first).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int, maxBucket: Long = defaultMaxBucket,
                   mat: Materializer = Materialize.LocalLazy): DataFrame =
    hammingPairs(simhashFingerprints(docs, idCol, textCol), maxDist,
      maxBucket, mat)

  /** The (doc_id, fp) 64-bit SimHash fingerprint table of
    * [[simhashPairs]], exposed for the maintained protocol
    * ([[graft.streaming.StreamingUpsert.hammingNearDupBatch]] — the
    * text modality maintains through the same persisted band index
    * the image dHash and audio energy hash use). Empty/null-text docs
    * all hash to the all-zero fingerprint and would pair
    * quadratically with each other — they carry no content to
    * compare, so drop them (mirrors minhashLshPairs).
    */
  def simhashFingerprints(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("mds", transform(toks($"text"), t => md5(t)))
      .filter(size($"mds") > 0)
      .select($"doc_id", simhash64($"mds").as("fp"))

  /** Banded Hamming near-dup pairs over PRECOMPUTED 64-char '0'/'1'
    * fingerprints (doc_id, fp) — [[simhashPairs]]' candidate+verify
    * machinery with the fingerprint pluggable, so ANY 64-bit
    * locality-preserving hash reuses it (SimHash for text, the
    * [[Media.dhashImages]] perceptual dHash for images). Same
    * pigeonhole guarantee: split into maxDist+1 contiguous bands and
    * a pair within `maxDist` must agree on at least one whole band —
    * banding is LOSSLESS for the distance threshold (modulo the
    * documented [[capBuckets]] hot-bucket cap); the verify is the
    * native codegen'd [[graft.plans.Native.hamming]]. Returns
    * (doc_a, doc_b, dist), doc_a &lt; doc_b, dist ≤ maxDist.
    *
    * Scale shape: one shuffle on (band, bkey) shared by the
    * population cap and the pair join; pair volume bounded by
    * maxBucket² per bucket; the fingerprint side is computed ONCE
    * (sealed via the Materializer) however many bands explode it.
    */
  /** The (band, bkey) rows of a 64-bit fingerprint under maxDist+1
    * contiguous bands — the blocking index [[hammingPairs]] joins on,
    * exposed for the maintained-state protocol
    * ([[graft.streaming.StreamingUpsert.dhashNearDupBatch]]), which
    * persists exactly these rows.
    */
  private[graft] def hammingBandBuckets(fps: DataFrame,
                                        maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      s"maxDist must be 0..7 (bandLen >= 8), got $maxDist")
    val bits = 64
    val nBands = maxDist + 1
    val base = bits / nBands
    val rem = bits % nBands
    val bandCols = (0 until nBands).map { b =>
      val start = b * base + math.min(b, rem)
      val len = base + (if (b < rem) 1 else 0)
      struct(lit(b).as("band"),
        substring($"fp", start + 1, len).as("bkey"))
    }
    fps.select($"doc_id", $"fp", explode(array(bandCols: _*)).as("bb"))
      .select($"doc_id", $"fp", $"bb.band".as("band"), $"bb.bkey".as("bkey"))
  }

  def hammingPairs(fps: DataFrame, maxDist: Int,
                   maxBucket: Long = defaultMaxBucket,
                   mat: Materializer = Materialize.LocalLazy): DataFrame = {
    require(maxBucket >= 1L, s"maxBucket must be >= 1, got $maxBucket")
    // Materialize once before AND after capping: the population
    // aggregate + join-back and both self-join sides otherwise re-run
    // the fingerprint pipeline per consumer (see minhashLshPairs).
    val rawBuckets = mat(hammingBandBuckets(fps, maxDist))
    val buckets = mat(capBuckets(rawBuckets, maxBucket))
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
      // native codegen expression: allocation-free byte loop instead of
      // split+zip_with+filter array churn per candidate pair
      .withColumn("dist", graft.plans.Native.hamming($"fp_a", $"fp_b"))
      .filter($"dist" <= maxDist)
      .select($"doc_a", $"doc_b", $"dist")
  }
}
