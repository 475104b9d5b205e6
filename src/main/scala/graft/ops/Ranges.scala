package graft
package ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — an operator Spark plans as a quadratic
  * theta-join when written naively (`l.key = r.key AND l.t >= r.start
  * AND l.t < r.end`). This version makes it an EQUI-join: intervals
  * are exploded into fixed-width time buckets, points map to their
  * bucket, and the join runs on (key, bucket) with the exact interval
  * predicate as a post-filter. Cost: |right| × (interval/bucketWidth)
  * replicated rows and one hash join — linear, shuffle-partitionable,
  * AQE-splittable, instead of a per-key cross product.
  *
  * A point matches at most once per interval (its bucket is unique and
  * each interval covers a bucket once), so no dedup is needed.
  */
object Ranges {

  /** Left row (point, `lTime`) joined to every right interval
    * [`startCol`, `endCol`) of the same key containing it. Inner join:
    * points in no interval drop out.
    */
  def bucketedRangeJoin(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String, lTime: String,
                        startCol: String, endCol: String,
                        bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0)
    val reserved = Seq("_b", "_rk", "_m", "_mEnd")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"input columns may not use reserved names ${reserved.mkString(",")}")
    // cast("timestamp"): NTZ columns resolve in the (UTC-pinned) session
    // zone so unix_micros accepts them
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))
    // Exact int64 FLOOR division (pmod is non-negative for positive
    // modulus, so this floors for negative epochs too). Double `/` +
    // cast would truncate toward zero and lose exactness past 2^53.
    // SQL DIV needs a named operand, so stage micros in `_m`.
    val bucketOfM = expr(s"(_m - pmod(_m, ${bucketMicros}L)) DIV ${bucketMicros}L")
    val rB = right
      .filter(col(endCol) > col(startCol)) // empty intervals match nothing
      .withColumn("_m", micros(startCol))
      .withColumn("_mEnd", micros(endCol) - 1)
      .withColumn("_b", explode(sequence(
        bucketOfM,
        expr(s"(_mEnd - pmod(_mEnd, ${bucketMicros}L)) DIV ${bucketMicros}L"))))
      .drop("_m", "_mEnd")
      .withColumnRenamed(rightKey, "_rk")
    val lB = left
      .withColumn("_m", micros(lTime))
      .withColumn("_b", bucketOfM)
      .drop("_m")
    lB.join(rB, lB("_b") === rB("_b") && col(leftKey) === col("_rk"))
      .filter(col(lTime) >= col(startCol) && col(lTime) < col(endCol))
      .drop("_b", "_rk")
  }

  /** INTERVAL × INTERVAL overlap join — the two-sided sibling of
    * [[bucketedRangeJoin]] (span-conflict detection, campaign/session
    * overlap, co-presence): left interval [`lStart`, `lEnd`) joined to
    * every right interval [`rStart`, `rEnd`) of the same key it
    * OVERLAPS (half-open: touching intervals do not match, the
    * boundary rule of the point form). Written naively this is a
    * quadratic theta-join; here BOTH sides explode into fixed-width
    * buckets and join equi on (key, bucket).
    *
    * Pair-once rule (no distinct): an overlapping pair shares every
    * bucket of its intersection, so the join would emit it once per
    * shared bucket — the match is kept ONLY in the canonical bucket of
    * `greatest(lStart, rStart)` (the intersection's first instant,
    * covered by both sides by definition). Empty intervals
    * (start == end) match nothing on either side.
    *
    * Scale shape: replicated rows = Σ interval lengths / bucketWidth
    * on each side, one hash join on (key, bucket), AQE-splittable;
    * size bucketMicros near the typical interval length — too small
    * multiplies rows, too large re-grows the per-bucket cross
    * product.
    */
  def bucketedIntervalOverlapJoin(left: DataFrame, right: DataFrame,
                                  leftKey: String, rightKey: String,
                                  lStart: String, lEnd: String,
                                  rStart: String, rEnd: String,
                                  bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0)
    val reserved = Seq("_lb", "_rb", "_rk", "_m", "_mEnd", "_g")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"input columns may not use reserved names ${reserved.mkString(",")}")
    require(Seq(lStart, lEnd).intersect(Seq(rStart, rEnd)).isEmpty,
      "left and right interval columns must have distinct names")
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))
    val bucketOfM = expr(
      s"(_m - pmod(_m, ${bucketMicros}L)) DIV ${bucketMicros}L")
    def buckets(df: DataFrame, s: String, e: String,
                out: String): DataFrame = df
      .filter(col(e) > col(s))
      .withColumn("_m", micros(s))
      .withColumn("_mEnd", micros(e) - 1)
      .withColumn(out, explode(sequence(
        bucketOfM,
        expr(s"(_mEnd - pmod(_mEnd, ${bucketMicros}L)) DIV ${bucketMicros}L"))))
      .drop("_m", "_mEnd")
    val lB = buckets(left, lStart, lEnd, "_lb")
    val rB = buckets(right, rStart, rEnd, "_rb")
      .withColumnRenamed(rightKey, "_rk")
    lB.join(rB, col("_lb") === col("_rb") && col(leftKey) === col("_rk"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .withColumn("_g", greatest(micros(lStart), micros(rStart)))
      .filter(expr(
        s"(_g - pmod(_g, ${bucketMicros}L)) DIV ${bucketMicros}L") ===
        col("_lb"))
      .drop("_lb", "_rb", "_rk", "_g")
  }
}
