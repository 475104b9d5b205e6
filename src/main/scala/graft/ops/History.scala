package graft
package ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse historization operators: slowly-changing-dimension
  * (SCD type 2) interval building from change events, and CDC
  * (change-data-capture) upsert/delete application to a snapshot —
  * the two halves of keeping a mutable source queryable as immutable
  * tables.
  */
object History {

  /** SCD type-2 historization: collapse each key's event stream into
    * validity intervals — one row per RUN of equal values, valid from
    * the run's first event to the next run's first event (exclusive),
    * `valid_to_us` null for the current state. Ordering is
    * (ts, idCol) so timestamp ties are deterministic; times are
    * integer epoch micros (the engine's cross-engine time discipline).
    *
    * Scale shape: two windows partitioned BY KEY over the key's own
    * events (the [[Sessions.sessionize]] caveat applies: bounded
    * per-key event counts; split hot keys upstream). Run-heads are
    * detected with lag, intervals closed with lead over the heads
    * only — no self-join, no corpus-sized single task.
    * Output: (key, state, valid_from_us, valid_to_us).
    */
  def scd2(events: DataFrame, keyCol: String, tsCol: String,
           idCol: String, valueCol: String): DataFrame = {
    val byKeyTime = Window.partitionBy(col("key"))
      .orderBy(col("ts_us").asc, col("id").asc)
    val heads = events
      .select(col(keyCol).as("key"), unix_micros(col(tsCol).cast("timestamp")).as("ts_us"),
        col(idCol).as("id"), col(valueCol).as("state"))
      .withColumn("_prev", lag(col("state"), 1).over(byKeyTime))
      .filter(col("_prev").isNull || col("_prev") =!= col("state"))
    heads
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(byKeyTime))
      .select(col("key"), col("state"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"))
  }

  /** Apply a CDC change stream to a snapshot: per key the LATEST
    * change by (ts, idCol) wins — an upsert replaces the value, a
    * delete (`opCol` = 'D') removes the key — and keys with no
    * changes keep their snapshot value. This is the MERGE a mutable
    * source's extract needs before it can live as an immutable table.
    *
    * Latest-change selection is the skew-immune max_by partial+final
    * aggregate (the [[Dedup.lastWriteWins]] shape — a billion-update
    * hot key costs one row per partition); application is one
    * full-outer join on the key. Output: (key, value) — the post-CDC
    * snapshot.
    */
  def applyCdc(snapshot: DataFrame, keyCol: String, valueCol: String,
               changes: DataFrame, cKeyCol: String, cTsCol: String,
               cIdCol: String, cOpCol: String,
               cValueCol: String): DataFrame = {
    val latest = changes
      .select(col(cKeyCol).as("key"), unix_micros(col(cTsCol).cast("timestamp")).as("ts_us"),
        col(cIdCol).as("id"), col(cOpCol).as("op"),
        col(cValueCol).as("cvalue"))
      .groupBy(col("key"))
      .agg(max_by(struct(col("op"), col("cvalue")),
        struct(col("ts_us"), col("id"))).as("_c"))
      .select(col("key"), col("_c.op").as("op"),
        col("_c.cvalue").as("cvalue"))
    snapshot.select(col(keyCol).as("key"), col(valueCol).as("value"))
      .join(latest, Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("key"),
        when(col("op").isNotNull, col("cvalue"))
          .otherwise(col("value")).as("value"))
  }

  /** Point-in-time (AS OF) lookup against an [[scd2]] history — the
    * time-travel probe every warehouse dimension serves: each probe
    * row (keyCol, tsCol) gains the `state` valid AT its timestamp.
    * Because scd2 validity intervals PARTITION each key's timeline
    * (every valid_from is the previous valid_to), the PIT lookup IS a
    * backward as-of join on valid_from — the interval END is
    * redundant for lookups — so the composition rides
    * [[AsOf.asofJoin]]'s single-shuffle union+running-last plan
    * instead of an interval join. Zero-length versions (two run heads
    * at one instant — the earlier is superseded the same microsecond)
    * are dropped first, which also makes the same-instant as-of tie
    * deterministic. Probes before a key's first version carry NULL
    * state.
    */
  def pointInTime(history: DataFrame, probes: DataFrame, keyCol: String,
                  tsCol: String): DataFrame = {
    val versions = history
      .filter(col("valid_to_us").isNull ||
        col("valid_to_us") > col("valid_from_us"))
      .select(col("key").as("_hk"),
        timestamp_micros(col("valid_from_us")).as("_vf"), col("state"))
    AsOf.asofJoin(probes, versions, keyCol, "_hk", tsCol, "_vf",
      payload = Seq("state"))
  }
}
