package graft
package ops

import org.apache.spark.sql.{Column, DataFrame}
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
    val reduced = regs.agg(
      count(lit(1)).as("n_filled"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - mj)"))
        .as("sum_filled"))
    val exact = df.agg(countDistinct(valueCol).as("n_exact"))
    // alpha_m for m >= 128 (Flajolet). The oracle SQL spells the SAME
    // arithmetic shape, so both engines produce the identical double.
    val est =
      s"(0.7213 / (1.0 + 1.079 / $m.0)) * $m.0 * $m.0 * " +
        s"CAST(${1L << maxRho} AS DOUBLE) / " +
        s"CAST(sum_filled + ($m - n_filled) * ${1L << maxRho} AS DOUBLE)"
    reduced.crossJoin(exact)
      .select(lit(m).as("m"), (lit(m) - $"n_filled").as("n_zero"),
        expr(est).as("raw_est"), $"n_exact")
      .select($"m", $"n_zero",
        when($"raw_est" <= lit(2.5) * m && $"n_zero" > 0L,
          log(lit(m.toDouble) / $"n_zero".cast("double")) * m.toDouble)
          .otherwise($"raw_est").as("estimate"),
        $"n_exact")
  }
}
