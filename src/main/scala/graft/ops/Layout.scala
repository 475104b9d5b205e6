package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered data layout — multi-column
  * min/max pruning for the 100 TB scan problem.
  *
  * A table sorted by ONE column prunes row groups only for predicates
  * on that column; every other column is uniform within each file and
  * its min/max footer stats span the whole domain, so selective
  * predicates on it still read everything. Interleaving the bits of
  * several columns' rank buckets into one Morton value and range-
  * clustering by THAT gives every clustered column a bounded range
  * per file/row group, so parquet's stats-based row-group skipping
  * (and any manifest-level file pruning) works for predicates on ANY
  * of them. This is the public lakehouse clustering technique (Morton
  * 1966; Delta OPTIMIZE ZORDER, Hudi clustering) expressed as plain
  * DataFrame transforms: a pay-once range shuffle at write time buys
  * every later scan its pruning — the same amortization argument as
  * [[graft.Tables.writeBucketed]] for joins, here for scans.
  *
  * Everything is in-plan and zero-UDF: per-column min/max ride along
  * as a broadcast 1-row stats attach (no driver collect), bucketing
  * is arithmetic, interleave is bits*d shift/mask terms inside
  * whole-stage codegen. The layout never affects RESULTS — only which
  * row groups a scan must read — so the oracle for any query over a
  * z-ordered copy is the plain SQL over the original table.
  */
object Layout {

  /** Interleave the low `bits` bits of `buckets` (one long Column per
    * clustered column) into a Morton value: bit i of column c lands at
    * position i*d + c. bits*d must fit a long.
    */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    val d = buckets.size
    require(d >= 1, "need at least one bucket column")
    require(bits >= 1 && bits * d <= 62,
      s"bits*cols must be 1..62, got $bits*$d")
    val terms = for { c <- 0 until d; i <- 0 until bits } yield
      shiftleft(shiftright(buckets(c), i).bitwiseAND(lit(1L)), i * d + c)
    terms.reduce(_ + _)
  }

  /** `df` plus one `_b_<col>` bucket column per clustered column:
    * linear min/max scaling into 2^bits buckets. Min/max come from a
    * broadcast 1-row aggregate (in-plan; no collect). Linear scaling
    * is deliberately simple — skewed columns fill buckets unevenly,
    * which costs pruning EFFICIENCY on the skewed column but never
    * correctness (results don't depend on the layout); an equi-depth
    * variant would swap in percentile boundaries here unchanged.
    */
  def withRankBuckets(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val nb = (1L << bits).toDouble
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"_mn_$c"),
      max(col(c)).cast("double").as(s"_mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val bcols = cols.map { c =>
      val mn = col(s"_mn_$c")
      val mx = col(s"_mx_$c")
      least(
        greatest(
          floor((col(c).cast("double") - mn) * nb / (mx - mn + lit(1.0))),
          lit(0.0)),
        lit(nb - 1.0)).cast("long").as(s"_b_$c")
    }
    df.crossJoin(broadcast(stats))
      .select(df.columns.map(col) ++ bcols: _*)
  }

  /** Equi-depth variant of [[withRankBuckets]]: bucket boundaries are
    * the (i/2^bits)-quantiles from `percentile_approx` (same 1-row
    * broadcast attach, still no collect), and a value's bucket is the
    * count of boundaries at or below it. Skewed columns fill buckets
    * EVENLY — the Morton curve then spends its resolution where the
    * data mass is, instead of burning most codes on an empty tail
    * (LayoutSpec measures the occupancy ratio on a quadratic skew).
    * The per-row cost is a 2^bits-element HOF filter per column —
    * acceptable for a write-once layout pass, not for a hot predicate.
    * Nulls land in bucket 0 (comparison yields null -> filtered out),
    * which is sound: the layout never affects results, only locality.
    */
  def withRankBucketsEquiDepth(df: DataFrame, cols: Seq[String],
                               bits: Int): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val nb = 1 << bits
    val pcts = typedLit((1 until nb).map(_.toDouble / nb))
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), pcts, lit(10000))
        .as(s"_bnd_$c"))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val bcols = cols.map { c =>
      size(filter(col(s"_bnd_$c"), b => col(c).cast("double") >= b))
        .cast("long").as(s"_b_$c")
    }
    df.crossJoin(broadcast(stats))
      .select(df.columns.map(col) ++ bcols: _*)
  }

  /** `df` with a `_z` Morton column over `cols` (buckets dropped). */
  def zOrdered(df: DataFrame, cols: Seq[String], bits: Int,
               equiDepth: Boolean = false): DataFrame = {
    val b =
      if (equiDepth) withRankBucketsEquiDepth(df, cols, bits)
      else withRankBuckets(df, cols, bits)
    b.withColumn("_z", zValue(cols.map(c => col(s"_b_$c")), bits))
      .select(df.columns.map(col) :+ col("_z"): _*)
  }

  /** Write `df` as a z-clustered managed table: range-partition by the
    * Morton value into `nRanges` contiguous curve chunks (one file
    * each), sort rows by it within each chunk, drop the helper column.
    * Each file/row group then covers a bounded range of EVERY
    * clustered column, which is what the parquet footer stats prune
    * on. The range exchange (with its sampling pass) is the pay-once
    * layout shuffle; stage-and-swap semantics come from
    * [[graft.Tables.writeTable]].
    */
  def writeZOrdered(df: DataFrame, table: String, cols: Seq[String],
                    bits: Int, nRanges: Int,
                    equiDepth: Boolean = false): Unit = {
    require(nRanges >= 1, s"nRanges must be >= 1, got $nRanges")
    val z = zOrdered(df, cols, bits, equiDepth)
      .repartitionByRange(nRanges, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
    graft.Tables.writeTable(z, table)
  }
}
