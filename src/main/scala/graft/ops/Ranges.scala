package graft
package ops

import org.apache.spark.sql.DataFrame
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
    val w = lit(bucketMicros)
    // cast("timestamp"): NTZ columns resolve in the (UTC-pinned) session
    // zone so unix_micros accepts them
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))
    val rB = right
      .filter(col(endCol) > col(startCol)) // empty intervals match nothing
      .withColumn("_b", explode(sequence(
        (micros(startCol) / w).cast("long"),
        ((micros(endCol) - 1) / w).cast("long"))))
      .withColumnRenamed(rightKey, "_rk")
    val lB = left
      .withColumn("_b", (micros(lTime) / w).cast("long"))
    lB.join(rB, lB("_b") === rB("_b") && col(leftKey) === col("_rk"))
      .filter(col(lTime) >= col(startCol) && col(lTime) < col(endCol))
      .drop("_b", "_rk")
  }
}
