package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  test("scd2: runs collapse, intervals chain exactly, current row open") {
    val ev = Seq(
      // key 1: A A B A -> runs A[100,300) B[300,400) A[400,null)
      (1L, t(100), 10L, "A"), (1L, t(200), 11L, "A"),
      (1L, t(300), 12L, "B"), (1L, t(400), 13L, "A"),
      // key 2: single event -> one open interval
      (2L, t(50), 20L, "X"),
      // key 3: timestamp TIE broken by id: (21, "P") before (22, "Q")
      (3L, t(70), 22L, "Q"), (3L, t(70), 21L, "P")
    ).toDF("k", "ts", "eid", "v")
    val got = History.scd2(ev, "k", "ts", "eid", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val us = (s: Long) => s * 1000000L
    assert(got === Set(
      (1L, "A", us(100), us(300)), (1L, "B", us(300), us(400)),
      (1L, "A", us(400), -1L),
      (2L, "X", us(50), -1L),
      (3L, "P", us(70), us(70)), (3L, "Q", us(70), -1L)))
    // intervals per key chain: valid_to of one run == valid_from of
    // the next (asserted by the exact set above), and exactly one
    // open interval per key
    assert(got.count(g => g._1 == 1L && g._4 == -1L) === 1)
  }

  test("applyCdc: latest wins, deletes drop, untouched keys keep snapshot") {
    val snap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val changes = Seq(
      // key 1: U then later D -> deleted
      (1L, t(100), 1L, "U", 11.0), (1L, t(200), 2L, "D", 0.0),
      // key 2: D then later U -> upserted to 22.0
      (2L, t(100), 3L, "D", 0.0), (2L, t(200), 4L, "U", 22.0),
      // key 4: new key via upsert
      (4L, t(100), 5L, "U", 44.0),
      // key 2 tie on ts at 200: larger id wins (id 6, value 23.0)
      (2L, t(200), 6L, "U", 23.0)
    ).toDF("ck", "cts", "cid", "op", "cv")
    val got = History.applyCdc(snap, "k", "v",
        changes, "ck", "cts", "cid", "op", "cv")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(2L -> 23.0, 3L -> 30.0, 4L -> 44.0))
  }

  test("pointInTime: version at each probe; NULL before first; same-instant supersede") {
    import org.apache.spark.sql.functions._
    // key u: A from 10:00, B from 11:00, C from 12:00; at 11:30 a
    // zero-length flurry (X then Y at the same microsecond) — wait, a
    // flurry is exercised below via a crafted history directly
    val ev = Seq(
      (1L, "u", "2024-01-01 10:00:00", "A"),
      (2L, "u", "2024-01-01 11:00:00", "B"),
      (3L, "u", "2024-01-01 12:00:00", "C"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", $"ts".cast("timestamp"))
    val hist = History.scd2(ev, "user_id", "ts", "event_id", "event_type")
    val probes = Seq(
      (10L, "u", "2024-01-01 09:30:00"), // before first -> NULL
      (11L, "u", "2024-01-01 10:00:00"), // exactly at valid_from -> A
      (12L, "u", "2024-01-01 11:59:59"), // inside B
      (13L, "u", "2024-01-01 13:00:00"), // open interval -> C
      (14L, "w", "2024-01-01 12:00:00")) // unknown key -> NULL
      .toDF("probe_id", "user_id", "pts")
      .withColumn("pts", $"pts".cast("timestamp"))
    val got = History.pointInTime(hist, probes, "user_id", "pts")
      .select("probe_id", "state")
      .as[(Long, Option[String])].collect().toMap
    assert(got === Map(10L -> None, 11L -> Some("A"), 12L -> Some("B"),
      13L -> Some("C"), 14L -> None))
    // same-instant supersede: two versions at one ts_us — the earlier
    // (zero-length) must not win the as-of tie
    val flurry = Seq(
      ("u", "X", 1000000L, Some(2000000L)),
      ("u", "Y", 2000000L, Some(2000000L)),  // zero-length: dropped
      ("u", "Z", 2000000L, None))
      .toDF("key", "state", "valid_from_us", "valid_to_us")
    val p2 = Seq((20L, "u", 3000000L)).toDF("probe_id", "key2", "us")
      .withColumn("pts", timestamp_micros($"us"))
    val got2 = History.pointInTime(flurry, p2, "key2", "pts")
      .select("probe_id", "state").as[(Long, String)].collect().toMap
    assert(got2 === Map(20L -> "Z"))
  }

  test("scd2StateBatch: fold equals batch scd2 under any in-order slicing; replay idempotent") {
    import graft.streaming.StreamingUpsert
    val ev = Seq(
      (1L, t(100), 10L, "A"), (1L, t(200), 11L, "A"),
      (1L, t(300), 12L, "B"), (1L, t(400), 13L, "A"),
      (2L, t(50), 20L, "X"), (2L, t(450), 21L, "X"),
      (3L, t(70), 22L, "Q"), (3L, t(70), 21L, "P"),
      (4L, t(350), 30L, "Z")
    ).toDF("k", "ts", "eid", "v")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val want = snap(History.scd2(ev, "k", "ts", "eid", "v"))
    // three different time-ordered slicings, incl. a batch that is
    // pure run-continuation (no head) and a batch introducing new keys
    val cuts = Seq(Seq(150L, 350L), Seq(60L, 400L), Seq(75L, 95L))
    for (Seq(c1, c2) <- cuts) {
      val base = java.nio.file.Files
        .createTempDirectory("scd2_state").toString
      val us = unix_micros($"ts".cast("timestamp"))
      def feed(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
        StreamingUpsert.scd2StateBatch(spark, b, "k", "ts", "eid", "v",
          base, id)
      feed(ev.filter(us < c1 * 1000000L), 0L)
      feed(ev.filter(us >= c1 * 1000000L && us < c2 * 1000000L), 1L)
      feed(ev.filter(us >= c2 * 1000000L), 2L)
      // replay the last batch: overwrite + distinct must absorb it
      feed(ev.filter(us >= c2 * 1000000L), 2L)
      val got = snap(StreamingUpsert.scd2FromState(spark, base))
      assert(got === want, s"cuts ($c1,$c2) diverged from batch scd2")
    }
  }

  test("scd2StateBatch REQUIREs in-order feeds (out-of-order event rejected)") {
    import graft.streaming.StreamingUpsert
    val base = java.nio.file.Files
      .createTempDirectory("scd2_state_ooo").toString
    def feed(rows: Seq[(Long, Timestamp, Long, String)], id: Long): Unit =
      StreamingUpsert.scd2StateBatch(spark,
        rows.toDF("k", "ts", "eid", "v"), "k", "ts", "eid", "v", base, id)
    feed(Seq((1L, t(100), 10L, "A"), (1L, t(200), 11L, "B")), 0L)
    // an event INSIDE the folded run (ts 150) must be rejected...
    val e1 = intercept[IllegalArgumentException] {
      feed(Seq((1L, t(150), 12L, "C")), 1L)
    }
    assert(e1.getMessage.contains("out-of-order"))
    // ...and so must a same-(ts,id)-or-earlier tie at the cursor
    val e2 = intercept[IllegalArgumentException] {
      feed(Seq((1L, t(200), 11L, "C")), 1L)
    }
    assert(e2.getMessage.contains("out-of-order"))
    // the rejected batches left state serveable and unchanged
    val got = StreamingUpsert.scd2FromState(spark, base)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got === Set((1L, "A", 100000000L, 200000000L),
      (1L, "B", 200000000L, -1L)))
    // a strictly-later event for the same key is accepted
    feed(Seq((1L, t(300), 13L, "C")), 1L)
    assert(StreamingUpsert.scd2FromState(spark, base).count() === 3L)
  }


  test("compactScd2State: bucketed closed table + delta serve equals the uncompacted state") {
    import graft.streaming.StreamingUpsert
    val ev = Seq(
      (1L, t(100), 10L, "A"), (1L, t(200), 11L, "B"),
      (1L, t(300), 12L, "A"), (2L, t(50), 20L, "X"),
      (2L, t(400), 21L, "Y"), (3L, t(150), 30L, "Q")
    ).toDF("k", "ts", "eid", "v")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val want = snap(History.scd2(ev, "k", "ts", "eid", "v"))
    val base = java.nio.file.Files
      .createTempDirectory("scd2_compact").toString
    val tbl = "scd2_closed_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val us = unix_micros($"ts".cast("timestamp"))
    def feed(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingUpsert.scd2StateBatch(spark, b, "k", "ts", "eid", "v",
        base, id)
    feed(ev.filter(us < 150L * 1000000L), 0L)
    feed(ev.filter(us >= 150L * 1000000L && us < 300L * 1000000L), 1L)
    StreamingUpsert.compactScd2State(spark, base, tbl)
    // the closed/ delta dir is gone; the table carries its rows
    assert(!new java.io.File(s"$base/closed").exists())
    feed(ev.filter(us >= 300L * 1000000L), 2L)
    val got = snap(StreamingUpsert.scd2FromCompactedState(spark, base, tbl))
    assert(got === want, "compacted scd2 serve diverged from batch scd2")
    // compacting twice (second fold = delta-only) stays equal
    StreamingUpsert.compactScd2State(spark, base, tbl)
    assert(snap(StreamingUpsert.scd2FromCompactedState(spark, base, tbl))
      === want)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

}
