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
}
