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
}
