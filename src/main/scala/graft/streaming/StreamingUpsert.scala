package graft
package streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery}
import graft.ops.Dedup

/** Structured Streaming form of the reference's stream-like semantics
  * (SURVEY.md §2.11): the ONLY stateful behavior the reference has is
  * the idempotent keyed upsert — re-running the scraper converges the
  * stores to the latest snapshot (scraper/main.py:263,277). Here that
  * becomes:
  *
  *  1. [[upsertQuery]] — readStream -> foreachBatch LWW merge into a
  *     keyed table (the Mongo bulk-upsert analog; exactly-once per the
  *     checkpointed batch id).
  *  2. [[dedupWithinWatermark]] — streaming dropDuplicates with
  *     watermark-bounded state (the "have I seen this key" crawl set,
  *     D1, with eviction so state doesn't grow unboundedly).
  *  3. [[hourlyCounts]] — watermarked tumbling-window aggregation (the
  *     streaming form of the batch q15 event rollup).
  *  4. [[latestPerKey]] — mapGroupsWithState custom state: running LWW
  *     emitted on every update (the ES-doc-id overwrite as a live view).
  *
  * Scale posture: all state is keyed and watermark-bounded (except the
  * deliberate unbounded LWW state in 4, documented); merges shuffle
  * once on the key. At 100 TB the foreachBatch target would be a
  * merge-capable table format — the batch-side merge function is
  * isolated in [[mergeBatch]] so only the sink write changes.
  */
object StreamingUpsert {

  /** One LWW merge step: existing table ∪ batch -> keyed latest,
    * written TEMP-THEN-SWAP: the merge writes to a sibling _tmp path
    * (reading the OLD table the whole time — never the path it is
    * replacing), then the table is swapped in with a filesystem
    * rename. A cache+count "barrier" would NOT be safe here: executor
    * loss after the overwrite deleted the old files would recompute
    * lineage against the truncated source and silently lose keys.
    * Table existence and the swap go through the Hadoop FileSystem
    * API, so the sink works on HDFS-like stores, not just local disk
    * (rename atomicity is FS-dependent — on object stores use a
    * merge-capable table format instead, as the class doc says).
    */
  def mergeBatch(spark: SparkSession, batch: DataFrame, keyCol: String,
                 orderCol: String, idCol: String, tablePath: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(tablePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(path)) spark.read.schema(batch.schema).parquet(tablePath)
      else batch.limit(0)
    val merged = Dedup.lastWriteWins(
      existing.unionByName(batch), keyCol, orderCol, idCol)
    val tmp = new org.apache.hadoop.fs.Path(tablePath + "_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(path, true)
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"rename $tmp -> $path failed")
  }

  /** S4/D2 streamed: idempotent keyed last-write-wins upsert sink. */
  def upsertQuery(stream: DataFrame, keyCol: String, orderCol: String,
                  idCol: String, tablePath: String,
                  checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, keyCol, orderCol, idCol,
          tablePath)
      }
      .start()

  /** D1 streamed: first-occurrence-wins dedup with watermark-bounded
    * state (keys older than the watermark are evicted — the unbounded
    * crawl `seen` set made safe for an infinite stream).
    */
  def dedupWithinWatermark(stream: DataFrame, keyCol: String,
                           tsCol: String, delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Watermarked tumbling-window counts per type — the streaming form
    * of the hourly event rollup (append-mode-capable: results finalize
    * when the watermark passes the window end).
    */
  def hourlyCounts(events: DataFrame, tsCol: String, typeCol: String,
                   delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      .agg(count(lit(1)).as("n"))

  /** Gap-based session aggregation per key — the streaming form of the
    * batch [[graft.ops.Sessions.sessionize]] (q34): Spark's native
    * `session_window` merges events separated by less than `gap` into
    * one growing window whose state is finalized (and emitted, in
    * append mode) once the watermark passes gap seconds beyond the last
    * event. State is one open window per active key — bounded by key
    * cardinality x open sessions, evicted by the watermark, which is
    * exactly the sessionization shape that scales on an unbounded
    * stream (the batch window form co-locates a key's FULL history
    * instead).
    */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
                    gap: String, delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  case class KV(k: String, v: Long, payload: String)

  /** Custom keyed state via mapGroupsWithState: the running LWW row per
    * key, re-emitted whenever it changes (update output mode). State is
    * one row per key — bounded by key cardinality, not stream length.
    */
  def latestPerKey(ds: Dataset[KV]): Dataset[KV] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[KV], state: GroupState[KV]) =>
          val best = (state.getOption.iterator ++ it)
            .maxBy(r => (r.v, r.payload))
          state.update(best)
          best
      }
  }
}
