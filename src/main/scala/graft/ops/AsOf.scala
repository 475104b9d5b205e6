package graft
package ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from existing operators per the preference order (no
  * custom SparkPlan needed): for every left row, attach the payload of
  * the LATEST right row with the same key and rightTime <= leftTime
  * (backward; the forward direction matches the EARLIEST right row at
  * or after, and a tolerance bounds how far the match may be — the
  * pandas merge_asof parameter surface).
  *
  * Implementation is the union + running-`last` trick, NOT an
  * inequality join: tag both inputs, union them, and take the running
  * last non-null payload over (key, time) with right rows sorting
  * before left rows at equal timestamps (inclusive bound). The
  * forward direction is the same window with time DESCENDING. The
  * matched payload carries its own timestamp so a tolerance is one
  * post-filter on the already-matched row — no second join. Cost is
  * ONE shuffle on the key plus a per-key sort — linear, while a naive
  * `l.key = r.key AND r.t <= l.t` theta-join explodes quadratically on
  * active keys at 100 TB.
  *
  * Determinism: right must be unique per (key, time) — pre-dedupe with
  * [[Dedup.lastWriteWins]] otherwise.
  */
object AsOf {

  /** Left BACKWARD as-of join (latest right at or before). Output =
    * every left row + `payload` columns from the matched right row
    * (nulls when no right row precedes it).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      payload, forward = false, toleranceSeconds = -1L)

  /** Left FORWARD as-of join (earliest right at or after), optionally
    * tolerance-bounded: a match farther than `toleranceSeconds` ahead
    * reverts to null payload (−1 = unbounded). The next-conversion /
    * attribution shape.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      payload: Seq[String],
                      toleranceSeconds: Long = -1L): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      payload, forward = true, toleranceSeconds = toleranceSeconds)

  /** [[asofJoin]] with a tolerance: a match farther than
    * `toleranceSeconds` BEHIND reverts to null payload.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        leftTime: String, rightTime: String,
                        payload: Seq[String],
                        toleranceSeconds: Long): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      payload, forward = false, toleranceSeconds = toleranceSeconds)

  private def asofImpl(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       payload: Seq[String], forward: Boolean,
                       toleranceSeconds: Long): DataFrame = {
    // The union/window machinery reserves these working names; an input
    // already carrying one would produce silently ambiguous columns.
    val reserved = Set("_k", "_t", "_side", "_p", "_match", "_mt")
    val clashes = (left.columns ++ right.columns).filter(reserved)
    require(clashes.isEmpty,
      s"asofJoin inputs must not contain reserved columns ${reserved.mkString(", ")}; " +
        s"found: ${clashes.distinct.mkString(", ")}")
    // Payload columns are appended to the left schema verbatim.
    val payloadClash = payload.filter(left.columns.contains)
    require(payloadClash.isEmpty,
      s"asofJoin payload names collide with left columns: ${payloadClash.mkString(", ")}" +
        " — rename on the right input before joining")
    // the matched struct carries its own time (_mt) so the tolerance
    // is a post-filter on the match, never a second join
    val pStruct = struct(col(rightTime).as("_mt") +:
      payload.map(col): _*)
    val pType = right.select(pStruct.as("_p")).schema("_p").dataType
    val leftFields = left.schema.fields.toSeq

    // A NULL right time would sort NULLS FIRST in the window and become
    // a permanent "match" for pre-first-row left rows; a real as-of
    // join never matches NULL times, so drop such rows.
    val rTagged = right.filter(col(rightTime).isNotNull).select(
      Seq(col(rightKey).as("_k"), col(rightTime).as("_t"),
        lit(0).as("_side"), pStruct.as("_p")) ++
        leftFields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val lTagged = left.select(
      Seq(col(leftKey).as("_k"), col(leftTime).as("_t"),
        lit(1).as("_side"), lit(null).cast(pType).as("_p")) ++
        leftFields.map(f => col(f.name)): _*)

    val tOrd = if (forward) col("_t").desc else col("_t").asc
    val w = Window.partitionBy(col("_k"))
      .orderBy(tOrd, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rTagged.unionByName(lTagged)
      .withColumn("_match", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val inTol =
      if (toleranceSeconds < 0L) col("_match").isNotNull
      else {
        val gap =
          if (forward)
            unix_micros(col("_match").getField("_mt").cast("timestamp")) -
              unix_micros(col("_t").cast("timestamp"))
          else
            unix_micros(col("_t").cast("timestamp")) -
              unix_micros(col("_match").getField("_mt").cast("timestamp"))
        col("_match").isNotNull && gap <= toleranceSeconds * 1000000L
      }
    matched.select(leftFields.map(f => col(f.name)) ++
      payload.map(p =>
        when(inTol, col("_match").getField(p)).as(p)): _*)
  }

  /** NEAREST as-of join — each left row pairs with the temporally
    * CLOSEST right row of the same key in EITHER direction,
    * optionally tolerance-bounded per side (the sensor-alignment /
    * pandas `merge_asof(direction='nearest')` shape). Composed from
    * the backward and forward passes — two single-shuffle runs, never
    * a theta join — with the closer match chosen per row in exact
    * micro arithmetic; an EQUIDISTANT before/after pair resolves
    * BACKWARD (pandas' rule, and consistent with backward's inclusive
    * at-or-before). Right rows sharing one (key, time) instant should
    * be pre-deduped (q18's discipline) — each directional pass's
    * same-instant winner is otherwise unspecified.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      payload: Seq[String],
                      toleranceSeconds: Long = -1L): DataFrame = {
    val temps = payload.flatMap(p => Seq(s"_b_$p", s"_f_$p")) ++
      Seq("_b__asof_t", "_f__asof_t")
    val clash = temps.filter((left.columns ++ right.columns).contains)
    require(clash.isEmpty,
      s"asofJoinNearest reserves ${clash.distinct.mkString(", ")}")
    // Mirror asofImpl's payload-vs-left guard: the directional passes
    // only see the _b_/_f_-prefixed names, so without this check a
    // payload name already present in left would come back as a
    // silently duplicated output column (ADVICE r13).
    val payloadClash = payload.filter(left.columns.contains)
    require(payloadClash.isEmpty,
      s"asofJoinNearest payload names collide with left columns: " +
        s"${payloadClash.mkString(", ")} — rename on the right input " +
        "before joining")
    def side(pfx: String) = right.select(
      Seq(col(rightKey), col(rightTime),
        col(rightTime).as(s"$pfx${"_asof_t"}")) ++
        payload.map(p => col(p).as(s"$pfx$p")): _*)
    val back = asofImpl(left, side("_b_"), leftKey, rightKey, leftTime,
      rightTime, payload.map("_b_" + _) :+ "_b__asof_t",
      forward = false, toleranceSeconds = toleranceSeconds)
    val both = asofImpl(back, side("_f_"), leftKey, rightKey, leftTime,
      rightTime, payload.map("_f_" + _) :+ "_f__asof_t",
      forward = true, toleranceSeconds = toleranceSeconds)
    val lUs = unix_micros(col(leftTime).cast("timestamp"))
    val bUs = unix_micros(col("_b__asof_t").cast("timestamp"))
    val fUs = unix_micros(col("_f__asof_t").cast("timestamp"))
    // backward wins when forward is absent, or both present and the
    // backward gap is <= the forward gap (equidistant -> backward)
    val useB = col("_f__asof_t").isNull ||
      (col("_b__asof_t").isNotNull && (lUs - bUs) <= (fUs - lUs))
    both.select(left.columns.map(col).toSeq ++
      payload.map(p =>
        when(useB, col(s"_b_$p")).otherwise(col(s"_f_$p")).as(p)): _*)
  }
}
