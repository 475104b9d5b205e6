package graft
package ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed sketches. Unlike the built-in
  * `approx_count_distinct` (whose HLL++ register layout is
  * engine-private), this HyperLogLog is defined entirely in terms of
  * md5 + exact integer arithmetic, so the estimate is BIT-IDENTICAL on
  * any engine, partitioning, or run — and therefore oracle-checkable
  * (q70). Flajolet et al., "HyperLogLog: the analysis of a
  * near-optimal cardinality estimation algorithm", AofA'07.
  *
  * Hash: v = int of the first 15 hex chars of md5(value) — 60
  * uniform bits, the same exact-int64 channel the minhash family
  * uses. Register index = v mod m (m = 2^b); payload w = v >> b
  * (60-b bits, exact integer shift — no double division, which loses
  * bits past 2^53); rho(w) = leading-zero count of the payload + 1 =
  * (60-b+1) - bit_length(w), with bit_length from the binary-string
  * length — exact integer/string ops, no float log2 (whose rounding
  * differs across engines).
  *
  * The harmonic sum stays EXACT: register j contributes
  * 2^(maxRho - M_j) as int64 (empty registers contribute 2^maxRho),
  * summed exactly — float summation would be partition-order-
  * dependent. The final estimate is a fixed shape of IEEE ops: one
  * cast, multiplies by exact powers of two, one division, and (in the
  * small-range branch) one ln — each deterministic on identical
  * inputs in any engine.
  *
  * Scale shape: one linear pass, one m-bounded aggregate (partial max
  * per register, single-row reduce) — the classic mergeable-sketch
  * plan; m is a constant, never corpus-sized.
  */
object Sketches {

  /** Count-min sketch frequency estimates (Cormode & Muthukrishnan,
    * "An improved data stream summary: the count-min sketch and its
    * applications", J. Algorithms 2005) with the engine's
    * deterministic hash channel: row i maps value v to column
    * int64(md5("i|" || v)[1..15 hex]) mod w. The sketch is one
    * groupBy over d exploded cells per value — a partial+final
    * aggregate, mergeable, m-bounded, never corpus-sized; the probe
    * side is a literal table built by the SAME hash on the driver
    * (java MD5 == Spark md5 on identical UTF-8 bytes).
    *
    * Returns one row per probe key: (tok, est, n_exact) — the classic
    * CMS guarantee est >= exact holds by construction (SketchesSpec
    * asserts), and the oracle recomputes both sides exactly, so the
    * estimate is hash-checked, not just bounded.
    */
  def cmsFrequencyAudit(values: DataFrame, valueCol: Column,
                        probeKeys: Seq[String], d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 8, s"d must be 1..8, got $d")
    require(w >= 2, s"w must be >= 2, got $w")
    val vals = values.select(valueCol.cast("string").as("v"))
    val cellStructs = (0 until d).map { i =>
      struct(lit(i).as("r"),
        pmod(conv(substring(md5(concat(lit(s"$i|"), col("v"))), 1, 15),
          16, 10).cast("long"), lit(w.toLong)).as("c"))
    }
    val cells = vals
      .select(explode(array(cellStructs: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
    val probeStructs = for { t <- probeKeys; r <- 0 until d } yield
      struct(lit(t).as("tok"), lit(r).as("r"),
        lit(cmsProbeCol(r, t, w)).as("c"))
    val probes = values.sparkSession.range(1)
      .select(explode(array(probeStructs: _*)).as("p"))
      .select(col("p.tok").as("tok"), col("p.r").as("r"), col("p.c").as("c"))
    val est = probes.join(broadcast(cells), Seq("r", "c"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    val exact = vals.filter(col("v").isin(probeKeys: _*))
      .groupBy(col("v").as("tok")).agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("tok"), "left")
      .select(col("tok"), col("est"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
  }

  /** CMS inner-product JOIN-SIZE estimate audited against the exact
    * cardinality (Cormode & Muthukrishnan §4.3: the inner product of
    * two count-min rows over-counts Σₖ a(k)·b(k) only by collision
    * mass, so minᵣ Σ_c A[r][c]·B[r][c] ≥ |A ⋈ B| with error ≤
    * ‖a‖₁‖b‖₁/w per row). This is the planner question — "how big is
    * this many-to-many join?" — answered from two m-bounded sketches
    * without touching the join itself: each side is one
    * partial+final cell aggregate (d·w cells max), the product one
    * broadcast-sized cell join. Same deterministic md5 channel as
    * [[cmsFrequencyAudit]], so any engine rebuilds both sketches
    * bit-identically and the AUDIT (est vs exact) is hash-checkable.
    * Output: one row (est_join_rows, n_exact) — the guarantee
    * est ≥ exact is structural (SketchesSpec asserts).
    *
    * Overflow bound: Σ cntA·cntB ≤ ‖a‖₁·‖b‖₁ — keep the product of
    * the two sides' total counts under 2^63 (at 10⁹ rows a side,
    * fine).
    */
  def cmsJoinSizeAudit(a: DataFrame, aCol: Column,
                       b: DataFrame, bCol: Column,
                       d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 8, s"d must be 1..8, got $d")
    require(w >= 2, s"w must be >= 2, got $w")
    def sketch(df: DataFrame, c: Column, cnt: String): DataFrame = {
      val vals = df.select(c.cast("string").as("v"))
      val cellStructs = (0 until d).map { i =>
        struct(lit(i).as("r"),
          pmod(conv(substring(md5(concat(lit(s"$i|"), col("v"))), 1, 15),
            16, 10).cast("long"), lit(w.toLong)).as("c"))
      }
      vals.select(explode(array(cellStructs: _*)).as("rc"))
        .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
        .agg(count(lit(1)).as(cnt))
    }
    val sa = sketch(a, aCol, "cnt_a")
    val sb = sketch(b, bCol, "cnt_b")
    // inner cell join: a cell missing on either side contributes 0.
    // A hash ROW with no overlapping cells has inner product 0 — it
    // must survive into the min (left join from the full row domain),
    // or disjoint-key sides would report the OTHER rows' collision
    // mass instead of 0.
    val ip = sa.join(sb, Seq("r", "c"))
      .groupBy(col("r"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("ip"))
    val est = a.sparkSession.range(d).select(col("id").cast("int").as("r"))
      .join(ip, Seq("r"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("est_join_rows"))
    val ea = a.select(aCol.cast("string").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("na"))
    val eb = b.select(bCol.cast("string").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("nb"))
    val exact = ea.join(eb, Seq("v"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("n_exact"))
    est.crossJoin(broadcast(exact))
  }

  /** Deterministic Bloom filter membership audit (Bloom, "Space/time
    * trade-offs in hash coding with allowable errors", CACM 1970):
    * value v sets bit int64(md5("bloomJ|" || v)[1..15 hex]) mod m for
    * J in 0 until k — the same md5 channel as CMS/HLL, so any engine
    * rebuilds the identical filter. The filter is represented as the
    * distinct set-bit table (<= m rows, broadcastable); a probe is
    * bloom-positive iff ALL k of its bits are set.
    *
    * Output one row per probe: (tok, in_exact, in_bloom) with the
    * classic one-sided guarantee in_bloom >= in_exact (no false
    * negatives, SketchesSpec asserts); false positives on the absent
    * probes ARE the measured error — size m against the expected
    * distinct count, the audit shows what an undersized filter costs.
    *
    * Scale shape: one linear pass, a x k Generate, one distinct
    * aggregate bounded by m (partial dedup caps each partition's
    * contribution at m rows), broadcast probe join — mergeable,
    * never corpus-sized.
    */
  def bloomMembershipAudit(values: DataFrame, valueCol: Column,
                           probeKeys: Seq[String], m: Int,
                           k: Int): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be 1..8, got $k")
    require(m >= 2, s"m must be >= 2, got $m")
    val vals = values.select(valueCol.cast("string").as("v"))
    val bitExprs = (0 until k).map { j =>
      pmod(conv(substring(md5(concat(lit(s"bloom$j|"), col("v"))), 1, 15),
        16, 10).cast("long"), lit(m.toLong))
    }
    val bits = vals.select(explode(array(bitExprs: _*)).as("pos"))
      .distinct().withColumn("hit", lit(1L))
    val probeStructs = for { t <- probeKeys; j <- 0 until k } yield
      struct(lit(t).as("tok"), lit(bloomProbeBit(j, t, m)).as("pos"))
    val probes = values.sparkSession.range(1)
      .select(explode(array(probeStructs: _*)).as("p"))
      .select(col("p.tok").as("tok"), col("p.pos").as("pos"))
    val inBloom = probes.join(broadcast(bits), Seq("pos"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("hit"), lit(0L))).as("in_bloom"))
    val inExact = vals.filter(col("v").isin(probeKeys: _*))
      .select(col("v").as("tok")).distinct()
      .withColumn("in_exact", lit(1L))
    inBloom.join(inExact, Seq("tok"), "left")
      .select(col("tok"),
        coalesce(col("in_exact"), lit(0L)).as("in_exact"),
        col("in_bloom"))
  }

  /** EXACT threshold heavy hitters with a sketch-gated shuffle — the
    * two-pass CMS pattern (Cormode & Muthukrishnan §4; the classic
    * scalable form of "every token occurring >= N times, with exact
    * counts"): pass 1 builds the m-bounded CMS over the occurrences;
    * pass 2 re-scans, probes each occurrence's d cells against the
    * BROADCAST sketch and drops rows whose estimate is below the
    * threshold BEFORE the exact count's shuffle. CMS estimates
    * dominate true counts (one-sided), so no truly-heavy token can be
    * dropped — the gating is RESULTS-INVISIBLE and the oracle is the
    * plain `GROUP BY ... HAVING count >= N`. What it buys at scale:
    * the exact aggregate shuffles only occurrences of candidate-heavy
    * tokens (false positives die at the final exact HAVING), where
    * the plain plan shuffles the whole token universe — at 100 TB the
    * distinct-token map-side hash no longer fits and every occurrence
    * of every rare token crosses the wire; here rare tokens never
    * leave their partition. Returns (tok, n) exact, n >= threshold.
    *
    * The crossover, measured (ProfileHeavy, PROFILE.md round 10):
    * pass 2 pays d md5 probes per occurrence plus a second scan, so
    * on a corpus whose distinct universe still fits map-side combine
    * the plain groupBy wins on wall even though the gate cuts 82% of
    * shuffle rows. Use this when distinct-per-partition is large
    * relative to executor memory — the regime where the plain plan's
    * combine degrades to shuffling every occurrence — not as a
    * default replacement for groupBy/HAVING.
    */
  def heavyHitters(values: DataFrame, valueCol: Column, threshold: Long,
                   d: Int, w: Int,
                   mat: Materializer = Materialize.Local): DataFrame = {
    require(d >= 1 && d <= 8, s"d must be 1..8, got $d")
    require(w >= 2, s"w must be >= 2, got $w")
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    // NULL keys are ignored EXPLICITLY (a NULL is not a token) rather
    // than implicitly by the inner probe joins below — the plain
    // GROUP BY counts a NULL group, so the semantics difference is a
    // stated contract, not a join mechanic.
    val vals = values.select(valueCol.cast("string").as("v"))
      .filter(col("v").isNotNull)
    def cellOf(i: Int): Column =
      pmod(conv(substring(md5(concat(lit(s"$i|"), col("v"))), 1, 15),
        16, 10).cast("long"), lit(w.toLong))
    val cellStructs = (0 until d).map(i =>
      struct(lit(i).as("r"), cellOf(i).as("c")))
    // materialized once (m-bounded): d broadcast branches below would
    // otherwise each recompute the corpus aggregate
    val cells = mat(vals
      .select(explode(array(cellStructs: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt")))
    // pass 2: gate each occurrence on its own min-cell estimate; the
    // d probes are d broadcast joins against the m-bounded cell table
    val gated = (0 until d).foldLeft(
        vals.select((col("v") +: (0 until d).map(i =>
          cellOf(i).as(s"_c$i"))): _*)) { (acc, i) =>
        acc.join(
          broadcast(cells.filter(col("r") === i)
            .select(col("c").as(s"_c$i"), col("cnt").as(s"_n$i"))),
          Seq(s"_c$i"))
      }
      .filter(least((0 until d).map(i => col(s"_n$i")): _*) >= threshold)
    gated.groupBy(col("v").as("tok")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }

  /** The Bloom bit of key `t` under hash row `j` (driver-side twin of
    * the in-plan hash, like [[cmsProbeCol]]). Shared with the
    * generated oracle SQL.
    */
  def bloomProbeBit(j: Int, t: String, m: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"bloom$j|$t".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    (BigInt(hex.substring(0, 15), 16) % m).toLong
  }

  /** The CMS probe column of key `t` in row `r` (driver-side twin of
    * the in-plan hash: java MD5 == Spark md5 == DuckDB md5 on the
    * same UTF-8 bytes). Shared with the generated oracle SQL.
    */
  def cmsProbeCol(r: Int, t: String, w: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$r|$t".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    (BigInt(hex.substring(0, 15), 16) % w).toLong
  }

  /** Grouped, MERGEABLE HLL register partials over `valueCol`: one
    * row per (dims..., bucket) with the register max — the
    * approximate-COUNT-DISTINCT member of the summary-partial family
    * ([[Summary]]). Exact distinct counts do not merge across groups
    * (distinct is not additive), but register maxes do, so a
    * finer-grain partial table serves approximate distinct counts at
    * ANY coarser grain ([[hllRollup]] + [[hllGroupEstimate]]) — the
    * warehouse-MV feature exact aggregates cannot provide (BigQuery
    * MVs expose exactly this via mergeable HLL++ state; here the
    * registers are the engine's deterministic md5 layout, so the
    * whole chain is oracle-checkable). Partial size is bounded by
    * groups × m, never corpus-sized.
    */
  def hllPartials(df: DataFrame, dims: Seq[String], valueCol: Column,
                  b: Int = 10): DataFrame = {
    require(b >= 4 && b <= 16, s"b must be 4..16, got $b")
    require(dims.nonEmpty, "need at least one dimension column")
    val m = 1L << b
    val maxRho = (60 - b) + 1
    val v = conv(substring(md5(valueCol.cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.select((dims.map(col) :+ pmod(v, lit(m)).as("bucket") :+
        shiftright(v, b).as("w")): _*)
      .select((dims.map(col) :+ $"bucket" :+
        when($"w" === 0L, lit(maxRho))
          .otherwise(lit(maxRho) - length(bin($"w"))).as("rho")): _*)
      .groupBy((dims :+ "bucket").map(col): _*)
      .agg(max($"rho").as("mj"))
  }

  /** Merge HLL partials to a coarser grain — lossless (register max
    * of maxes), the [[Summary.rollup]] analog.
    */
  def hllRollup(partials: DataFrame, groupDims: Seq[String]): DataFrame = {
    require(groupDims.nonEmpty, "need at least one dimension column")
    partials.groupBy((groupDims :+ "bucket").map(col): _*)
      .agg(max($"mj").as("mj"))
  }

  /** Per-group estimate from register partials: (dims..., m, n_zero,
    * estimate) — the [[hllDistinctAudit]] arithmetic shape applied
    * per group (same exact int64 harmonic sum, same small-range
    * linear-counting branch), so any engine reproduces the identical
    * doubles.
    */
  /** Flajolet's α_m · m² · 2^maxRho folded LEFT-ASSOCIATIVELY in
    * Scala doubles. Why not an `expr("0.7213 / ...")` string: Spark
    * SQL parses those literals as DECIMALs, whose bounded-scale
    * quotient differs from the IEEE double chain by ~6e-11 relative —
    * invisible while the linear-counting branch fires (every
    * gate-scale cardinality), but a hash mismatch the moment the raw
    * harmonic branch is exercised (caught building q162). The oracle
    * text replays the same left-associated double chain.
    */
  private def hllRawConst(m: Long, maxRho: Int): Double =
    0.7213 / (1.0 + 1.079 / m.toDouble) * m.toDouble * m.toDouble *
      (1L << maxRho).toDouble

  /** raw_est column: [[hllRawConst]] over the exact int64 denominator. */
  private def hllRawEst(m: Long, maxRho: Int): Column =
    lit(hllRawConst(m, maxRho)) /
      ($"sum_filled" + (lit(m) - $"n_filled") * lit(1L << maxRho))
        .cast("double")

  def hllGroupEstimate(partials: DataFrame, groupDims: Seq[String],
                       b: Int = 10): DataFrame = {
    require(groupDims.nonEmpty, "need at least one dimension column")
    val m = 1L << b
    val maxRho = (60 - b) + 1
    val reduced = partials.groupBy(groupDims.map(col): _*).agg(
      count(lit(1)).as("n_filled"),
      coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - mj)")),
        lit(0L)).as("sum_filled"))
    reduced
      .select((groupDims.map(col) :+ lit(m).as("m") :+
        (lit(m) - $"n_filled").as("n_zero") :+
        hllRawEst(m, maxRho).as("raw_est")): _*)
      .select((groupDims.map(col) :+ $"m" :+ $"n_zero" :+
        when($"raw_est" <= lit(2.5) * m && $"n_zero" > 0L,
          log(lit(m.toDouble) / $"n_zero".cast("double")) * m.toDouble)
          .otherwise($"raw_est").as("estimate")): _*)
  }

  /** Persist grouped HLL partials as a maintained asset (the
    * [[Summary.writeSummary]] discipline: stage-and-swap table +
    * `_files` coverage companion + `_meta` parameters). `df` must be
    * a plain file scan.
    */
  def writeHllSummary(df: DataFrame, table: String, dims: Seq[String],
                      valueCol: String, b: Int = 10): Unit = {
    Manifest.requirePlainScan(df, "writeHllSummary")
    val spark = df.sparkSession
    import spark.implicits._
    graft.Tables.writeTable(hllPartials(df, dims, col(valueCol), b), table)
    Summary.writeFilesList(spark, table + "_files",
      df.inputFiles.map(Manifest.norm).toSet)
    graft.Tables.writeTable(
      Seq((dims, valueCol, b)).toDF("dims", "value_col", "b"),
      table + "_meta")
  }

  /** Incrementally maintain a persisted HLL summary — the
    * [[Summary.refreshSummary]] contract with an even stronger merge:
    * register maxes are IDEMPOTENT (max(a,a) = a), but the files diff
    * keeps the cost argument identical — appended files are sketched
    * alone and max-merged; a removed file still forces the rebuild
    * (registers cannot un-see a value). Returns files read.
    */
  def refreshHllSummary(spark: SparkSession, fullScan: DataFrame,
                        table: String): Long = {
    val m = spark.table(table + "_meta").head()
    val dims = m.getSeq[String](m.fieldIndex("dims"))
    val valueCol = m.getAs[String]("value_col")
    val b = m.getAs[Int]("b")
    val (newFiles, anyGone, current) =
      Summary.filesDiff(spark, fullScan, table + "_files")
    if (anyGone) {
      Manifest.requirePlainScan(fullScan, "refreshHllSummary (rebuild)")
      graft.Tables.writeTable(
        hllPartials(fullScan, dims, col(valueCol), b), table)
      Summary.writeFilesList(spark, table + "_files", current)
      current.size.toLong
    } else if (newFiles.nonEmpty) {
      val delta = hllPartials(spark.read.parquet(newFiles: _*),
        dims, col(valueCol), b)
      graft.Tables.writeTable(
        hllRollup(spark.table(table).unionByName(delta), dims), table)
      Summary.writeFilesList(spark, table + "_files", current)
      newFiles.length.toLong
    } else 0L
  }

  // ------------------------------------------------------------ quantiles

  /** Mergeable QUANTILE sketch — the missing rank member of the
    * sketch family (cardinality = HLL, frequency = CMS, membership =
    * Bloom, set-similarity = KMV): a uniform bottom-k-by-hash row
    * sample, per dims group.
    *
    * WHY NOT KLL / t-digest (VERDICT r11 Next #4 named them): their
    * compaction decisions depend on the MERGE TREE — the same row
    * multiset summarized under two partitionings yields two
    * different (equally error-bounded) sketches — which is
    * incompatible with this engine's gate discipline: every sketch
    * estimate must be a pure function of the row multiset so a
    * different engine (the DuckDB oracle) rebuilds it bit-for-bit
    * (the q144 rule). The order-invariant member of the quantile
    * family is the uniform sample keyed by a deterministic row hash
    * — the KMV construction (Bar-Yossef et al. RANDOM'02) pointed at
    * RANKS instead of distinct counts: keep, per group, the k rows
    * whose md5(rowKey) sorts lexicographically smallest. Merge of
    * sketches over disjoint row sets = union + re-bottom-k — exact
    * (bottom-k of a union IS the bottom-k of the union of bottom-ks)
    * and merge-tree-invariant, so incremental maintenance reproduces
    * the one-shot sketch bit-for-bit (SketchesSpec asserts). Rank
    * error is the DKW bound for a k-sample empirical CDF
    * (Dvoretzky–Kiefer–Wolfowitz): eps = sqrt(ln(2/delta) / (2k)) —
    * k = 512 gives ~7% rank error at 99% confidence, k = 4096 ~2.5%;
    * KLL's O(1/k) is asymptotically tighter, which is exactly the
    * price of bit-exact order-invariance, stated here rather than
    * hidden.
    *
    * CONTRACT: `keyCol` must be row-unique (it is the sample's
    * randomness source — duplicate keys under-sample their rows and
    * tie under row_number); NULL keys and NULL values are excluded
    * (a NULL has no rank).
    *
    * Scale shape: the bottom-k per group is salted two-phase (the
    * [[Sessions.capPerKeySalted]] protocol) — phase 1 ranks within
    * (dims, salt) so no single task ever sorts a whole hot group,
    * phase 2 re-ranks the ≤ salts·k survivors per group. Output:
    * (dims..., h, v) — ≤ k rows per group, sorted nowhere (the
    * sketch is a SET; [[quantileEstimates]] orders it).
    */
  def quantilePartials(df: DataFrame, dims: Seq[String], keyCol: Column,
                       valueCol: Column, k: Int,
                       salts: Int = 32): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(
        (dims.map(col) :+ md5(keyCol.cast("string")).as("h")
          :+ valueCol.as("v")): _*)
      .filter(col("h").isNotNull && col("v").isNotNull)
    // salt from hex chars 9-12 of h — bits disjoint from the leading
    // chars the bottom-k ORDERS on, so salts stay uniform over the
    // surviving (smallest-h) rows
    val withSalt = base.withColumn("_salt",
      pmod(conv(substring(col("h"), 9, 4), 16, 10).cast("long"),
        lit(salts.toLong)))
    val w1 = Window.partitionBy((dims.map(col) :+ col("_salt")): _*)
      .orderBy(col("h").asc, col("v").asc)
    val w2 = Window.partitionBy(dims.map(col): _*)
      .orderBy(col("h").asc, col("v").asc)
    withSalt
      .withColumn("_r1", row_number().over(w1)).filter(col("_r1") <= k)
      .withColumn("_r2", row_number().over(w2)).filter(col("_r2") <= k)
      .drop("_salt", "_r1", "_r2")
  }

  /** Re-bottom-k after unioning sketches (the merge): exact over
    * disjoint underlying row sets — see [[quantilePartials]].
    */
  def quantileMerge(partials: DataFrame, dims: Seq[String],
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(dims.map(col): _*)
      .orderBy(col("h").asc, col("v").asc)
    partials.withColumn("_r", row_number().over(w)).filter(col("_r") <= k)
      .drop("_r")
  }

  /** Serve quantile estimates from a sketch: per group, the sampled
    * values sort ascending and permille point p is the value at rank
    * ceil(p·m/1000) (1-based lower empirical quantile — all-integer
    * arithmetic, so the served value replays exactly in any engine;
    * a float `p*m` rank would round differently near boundaries).
    * Output: (dims..., n_sample, p<permille>...). Groups are sketch-
    * sized (≤ k rows), so the collect_list is bounded by k.
    */
  def quantileEstimates(partials: DataFrame, dims: Seq[String],
                        permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty && permille.forall(p => p >= 1 && p <= 1000),
      s"permille points must be 1..1000, got $permille")
    val g = if (dims.isEmpty) partials.groupBy()
            else partials.groupBy(dims.map(col): _*)
    val agg = g.agg(count(lit(1)).as("n_sample"),
      sort_array(collect_list(col("v"))).as("_vs"))
    // empty-group guard: the global (dims-empty) aggregate emits one
    // row even over zero input; its points are NULL, not an ANSI
    // array-index error (callers check n_sample)
    val points = permille.map { p =>
      when(col("n_sample") > 0L, element_at(col("_vs"),
        greatest(lit(1L), expr(s"($p * n_sample + 999) DIV 1000"))
          .cast("int"))).as(s"p$p")
    }
    agg.select((dims.map(col) :+ col("n_sample")) ++ points: _*)
  }

  /** Persist a grouped quantile sketch as a maintained asset (the
    * [[Summary.writeSummary]] discipline: stage-and-swap table +
    * `_files` coverage companion + `_meta` parameters). `keyExpr` is
    * a SQL expression string (it must round-trip through `_meta` —
    * e.g. a concat of the row's natural key columns).
    */
  def writeQuantileSummary(df: DataFrame, table: String, dims: Seq[String],
                           keyExpr: String, valueCol: String,
                           k: Int): Unit = {
    Manifest.requirePlainScan(df, "writeQuantileSummary")
    val spark = df.sparkSession
    import spark.implicits._
    graft.Tables.writeTable(
      quantilePartials(df, dims, expr(keyExpr), col(valueCol), k), table)
    Summary.writeFilesList(spark, table + "_files",
      df.inputFiles.map(Manifest.norm).toSet)
    graft.Tables.writeTable(
      Seq((dims, keyExpr, valueCol, k))
        .toDF("dims", "key_expr", "value_col", "k"),
      table + "_meta")
  }

  /** Incrementally maintain a persisted quantile sketch — the
    * [[Summary.refreshSummary]] contract: appended files are sketched
    * ALONE and merged (delta-sized, and the merge is EXACT — the
    * refreshed asset is bit-identical to a one-shot sketch of the
    * grown base, unlike a KLL whose refresh would drift from the
    * rebuild); any removed file forces the full rebuild (a sample
    * cannot un-see rows). Returns files read.
    */
  def refreshQuantileSummary(spark: SparkSession, fullScan: DataFrame,
                             table: String): Long = {
    val m = spark.table(table + "_meta").head()
    val dims = m.getSeq[String](m.fieldIndex("dims"))
    val keyExpr = m.getAs[String]("key_expr")
    val valueCol = m.getAs[String]("value_col")
    val k = m.getAs[Int]("k")
    val (newFiles, anyGone, current) =
      Summary.filesDiff(spark, fullScan, table + "_files")
    if (anyGone) {
      Manifest.requirePlainScan(fullScan, "refreshQuantileSummary (rebuild)")
      graft.Tables.writeTable(
        quantilePartials(fullScan, dims, expr(keyExpr), col(valueCol), k),
        table)
      Summary.writeFilesList(spark, table + "_files", current)
      current.size.toLong
    } else if (newFiles.nonEmpty) {
      val delta = quantilePartials(spark.read.parquet(newFiles: _*),
        dims, expr(keyExpr), col(valueCol), k)
      graft.Tables.writeTable(
        quantileMerge(spark.table(table).unionByName(delta), dims, k), table)
      Summary.writeFilesList(spark, table + "_files", current)
      newFiles.length.toLong
    } else 0L
  }

  /** KMV (bottom-k minimum values) sketch of the distinct keys: the k
    * lexicographically smallest md5 hashes (Bar-Yossef et al. RANDOM'02
    * distinct-count sketch; Beyer et al. SIGMOD'07 for the multi-set
    * estimators). The engine's md5 channel keeps it deterministic and
    * engine-portable — any engine rebuilds the identical sketch, so
    * KMV estimates are oracle-checkable like the HLL/CMS/Bloom family.
    *
    * Scale shape: one distinct aggregate then a TakeOrderedAndProject
    * (per-partition bottom-k, k-bounded driver merge) — mergeable
    * (union of sketches → bottom-k) and never corpus-sized. This is
    * the sketch for cross-corpus OVERLAP questions (contamination
    * estimation) at sizes where the exact semi-join of q51 is itself
    * a major job: two k-row sketches answer "what fraction of corpus
    * B's shingles are in corpus A" to ~1/sqrt(k) without any join of
    * the corpora.
    */
  def kmvSketch(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // NULL is not a key: md5(NULL) is NULL, and engines DISAGREE on
    // where NULL sorts (Spark ascending = nulls first, DuckDB = last)
    // — dropping it explicitly keeps the sketch engine-portable
    // instead of depending on collation accidents.
    df.select(md5(keyCol.cast("string")).as("h"))
      .filter(col("h").isNotNull)
      .distinct().orderBy(col("h")).limit(k)
  }

  /** One-row KMV Jaccard audit between the key sets of `a` and `b`:
    * the union's bottom-k U is computable from the two sketches alone
    * (bottom-k of a union = bottom-k of the union of bottom-k's), and
    * for every h ∈ U membership in A/B is decidable FROM THE SKETCHES
    * (h ≤ kth(A∪B) ≤ kth(A), so h ∈ A ⟹ h ∈ sketch(A)) — the
    * estimator ĵ = |U ∩ A ∩ B| / |U| needs no corpus access at all.
    * Output: (k, u_size, kmv_matches, est_j) next to the exact
    * (n_a, n_b, exact_inter, exact_j) — the q70/q72 self-audit shape;
    * at true scale the exact columns are dropped and only the
    * sketch-sized plan remains. When k >= |A ∪ B| the estimate IS
    * exact (SketchesSpec asserts); error at k << n is ~1/sqrt(k).
    */
  def kmvOverlapAudit(a: DataFrame, aCol: Column,
                      b: DataFrame, bCol: Column, k: Int): DataFrame = {
    val sa = kmvSketch(a, aCol, k)
    val sb = kmvSketch(b, bCol, k)
    val u = sa.unionByName(sb).distinct().orderBy(col("h")).limit(k)
    val est = u
      .join(sa, Seq("h"), "left_semi")
      .join(sb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("kmv_matches"))
    val uSize = u.agg(count(lit(1)).as("u_size"))
    val da = a.select(aCol.cast("string").as("v")).distinct()
    val db = b.select(bCol.cast("string").as("v")).distinct()
    val exactCounts = da.agg(count(lit(1)).as("n_a"))
      .crossJoin(db.agg(count(lit(1)).as("n_b")))
      .crossJoin(da.join(db, Seq("v"), "left_semi")
        .agg(count(lit(1)).as("exact_inter")))
    // 1-row attaches only (the broadcast stats-frame pattern)
    uSize.crossJoin(est).crossJoin(exactCounts)
      .select(lit(k.toLong).as("k"), col("u_size"), col("kmv_matches"),
        (col("kmv_matches").cast("double") / col("u_size").cast("double"))
          .as("est_j"),
        col("n_a"), col("n_b"), col("exact_inter"),
        (col("exact_inter").cast("double") /
          (col("n_a") + col("n_b") - col("exact_inter")).cast("double"))
          .as("exact_j"))
  }

  /** HLL set-INTERSECTION estimate via inclusion–exclusion, audited
    * against the exact: |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), where
    * the union estimate comes FREE from the sketches' mergeability
    * (register-wise max — no data access), the property that makes
    * this the cross-corpus overlap answer when A and B are 100 TB
    * apart and only their m-register summaries travel. Same 60-bit
    * md5 register channel as [[hllDistinctAudit]], so all three
    * estimates (and hence the audit) replay bit-identically in SQL.
    * The inclusion–exclusion difference is clamped at 0 (estimator
    * noise can push a near-empty intersection negative — the classic
    * caveat, stated rather than hidden; relative error grows as the
    * true intersection shrinks vs the union). Output one row:
    * (est_a, est_b, est_union, est_inter, n_exact_inter).
    */
  def hllIntersectionAudit(a: DataFrame, aCol: Column,
                           b: DataFrame, bCol: Column,
                           bits: Int = 10,
                           mat: Materializer = Materialize.Local): DataFrame = {
    require(bits >= 4 && bits <= 16, s"bits must be 4..16, got $bits")
    val m = 1L << bits
    val maxRho = (60 - bits) + 1
    def regs(df: DataFrame, c: Column): DataFrame = {
      val v = conv(substring(md5(c.cast("string")), 1, 15), 16, 10)
        .cast("long")
      df.select(pmod(v, lit(m)).as("bucket"), shiftright(v, bits).as("w"))
        .select($"bucket",
          when($"w" === 0L, lit(maxRho))
            .otherwise(lit(maxRho) - length(bin($"w"))).as("rho"))
        .groupBy($"bucket").agg(max($"rho").as("mj"))
    }
    def estimate(rg: DataFrame, name: String): DataFrame = {
      val reduced = rg.agg(
        count(lit(1)).as("n_filled"),
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - mj)")),
          lit(0L)).as("sum_filled"))
      reduced
        .select(hllRawEst(m, maxRho).as("raw_est"),
          (lit(m) - $"n_filled").as("n_zero"))
        .select(when($"raw_est" <= lit(2.5) * m && $"n_zero" > 0L,
          log(lit(m.toDouble) / $"n_zero".cast("double")) * m.toDouble)
          .otherwise($"raw_est").as(name))
    }
    // registers feed their own estimate AND the union merge
    val ra = mat(regs(a, aCol))
    val rb = mat(regs(b, bCol))
    val ru = ra.unionByName(rb).groupBy($"bucket").agg(max($"mj").as("mj"))
    val exact = a.select(aCol.cast("string").as("v")).distinct()
      .join(b.select(bCol.cast("string").as("v")).distinct(), Seq("v"))
      .agg(count(lit(1)).as("n_exact_inter"))
    estimate(ra, "est_a").crossJoin(estimate(rb, "est_b"))
      .crossJoin(estimate(ru, "est_union"))
      .select($"est_a", $"est_b", $"est_union",
        greatest($"est_a" + $"est_b" - $"est_union", lit(0.0))
          .as("est_inter"))
      .crossJoin(broadcast(exact))
  }

  /** One-row HLL cardinality audit of `valueCol`:
    * (m, n_zero, estimate, n_exact) — the sketch estimate NEXT TO the
    * exact distinct count, so the query measures its own error (the
    * q64/q66 self-audit shape). Drop the n_exact column at true
    * scale; it is the audit, not the operator.
    */
  def hllDistinctAudit(df: DataFrame, valueCol: Column,
                       b: Int = 10): DataFrame = {
    require(b >= 4 && b <= 16, s"b must be 4..16, got $b")
    val m = 1L << b
    val maxRho = (60 - b) + 1
    val v = conv(substring(md5(valueCol.cast("string")), 1, 15), 16, 10)
      .cast("long")
    val withRho = df.select(
        pmod(v, lit(m)).as("bucket"),
        shiftright(v, b).as("w")) // v >= 0, so >> is exact floor-div
      .select($"bucket",
        when($"w" === 0L, lit(maxRho))
          .otherwise(lit(maxRho) - length(bin($"w"))).as("rho"))
    val regs = withRho.groupBy($"bucket").agg(max($"rho").as("mj"))
    // coalesce: an EMPTY input yields sum=NULL, which would propagate
    // a NULL estimate through raw_est; with 0 the n_zero=m linear-
    // counting branch fires and the empty corpus estimates 0 (ADVICE r4)
    val reduced = regs.agg(
      count(lit(1)).as("n_filled"),
      coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - mj)")),
        lit(0L)).as("sum_filled"))
    val exact = df.agg(countDistinct(valueCol).as("n_exact"))
    // alpha_m for m >= 128 (Flajolet). hllRawConst folds the constant
    // in IEEE doubles (NOT an expr string — Spark would parse the
    // literals as DECIMALs), so both engines produce the identical
    // double.
    reduced.crossJoin(exact)
      .select(lit(m).as("m"), (lit(m) - $"n_filled").as("n_zero"),
        hllRawEst(m, maxRho).as("raw_est"), $"n_exact")
      .select($"m", $"n_zero",
        when($"raw_est" <= lit(2.5) * m && $"n_zero" > 0L,
          log(lit(m.toDouble) / $"n_zero".cast("double")) * m.toDouble)
          .otherwise($"raw_est").as("estimate"),
        $"n_exact")
  }
}
