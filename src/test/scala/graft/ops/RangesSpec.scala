package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangesSpec extends SparkSpec {
  import spark.implicits._

  private val HourMicros = 3600L * 1000000L

  private def pts(rows: (Long, String, String)*): DataFrame =
    rows.toDF("event_id", "k", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))

  private def ivs(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("iv_id", "ik", "w_start", "w_end")
      .withColumn("w_start", $"w_start".cast("timestamp"))
      .withColumn("w_end", $"w_end".cast("timestamp"))

  private def join(l: DataFrame, r: DataFrame,
                   bucket: Long = HourMicros): DataFrame =
    Ranges.bucketedRangeJoin(l, r, "k", "ik", "ts", "w_start", "w_end", bucket)

  test("boundary semantics: ts == start matches, ts == end does not") {
    val l = pts(
      (1L, "a", "2024-01-01 10:00:00"),  // == start -> in
      (2L, "a", "2024-01-01 11:59:59"),  // inside   -> in
      (3L, "a", "2024-01-01 12:00:00"))  // == end   -> out
    val r = ivs((10L, "a", "2024-01-01 10:00:00", "2024-01-01 12:00:00"))
    val got = join(l, r).select("event_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }

  test("interval straddling many buckets matches points in every bucket") {
    // 5-hour interval, 1-hour buckets: points land in distinct buckets.
    val l = pts(
      (1L, "a", "2024-01-01 00:30:00"),
      (2L, "a", "2024-01-01 02:30:00"),
      (3L, "a", "2024-01-01 04:59:59"),
      (4L, "a", "2024-01-01 05:00:01")) // past end
    val r = ivs((10L, "a", "2024-01-01 00:00:00", "2024-01-01 05:00:00"))
    val got = join(l, r).select("event_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L))
  }

  test("a point matches each covering interval exactly once (no bucket dups)") {
    val l = pts((1L, "a", "2024-01-01 03:30:00"))
    val r = ivs(
      (10L, "a", "2024-01-01 00:00:00", "2024-01-01 12:00:00"),
      (11L, "a", "2024-01-01 03:00:00", "2024-01-01 04:00:00"),
      (12L, "a", "2024-01-01 04:00:00", "2024-01-01 05:00:00"))
    val got = join(l, r).select("iv_id").as[Long].collect().toSeq.sorted
    assert(got === Seq(10L, 11L))
  }

  test("empty interval (start == end) matches nothing") {
    val l = pts((1L, "a", "2024-01-01 10:00:00"))
    val r = ivs((10L, "a", "2024-01-01 10:00:00", "2024-01-01 10:00:00"))
    assert(join(l, r).count() === 0L)
  }

  test("keys must match") {
    val l = pts((1L, "a", "2024-01-01 10:30:00"))
    val r = ivs((10L, "b", "2024-01-01 10:00:00", "2024-01-01 11:00:00"))
    assert(join(l, r).count() === 0L)
  }

  test("negative epochs: floor (not truncate-toward-zero) bucketing") {
    // Pre-1970 micros are negative; truncating division maps
    // [-1h, +1h) into bucket 0 and drops cross-epoch matches.
    val l = pts(
      (1L, "a", "1969-12-31 23:30:00"),
      (2L, "a", "1969-12-31 22:59:59"), // before start
      (3L, "a", "1970-01-01 00:15:00"))
    val r = ivs((10L, "a", "1969-12-31 23:00:00", "1970-01-01 00:30:00"))
    val got = join(l, r).select("event_id").as[Long].collect().toSet
    assert(got === Set(1L, 3L))
  }

  test("reserved temp-column names are rejected") {
    val l = pts((1L, "a", "2024-01-01 10:00:00")).withColumn("_b", lit(1))
    val r = ivs((10L, "a", "2024-01-01 10:00:00", "2024-01-01 11:00:00"))
    intercept[IllegalArgumentException](join(l, r))
  }

  test("matches the naive theta-join on randomized data (property)") {
    val rnd = new scala.util.Random(7)
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    val l = Seq.tabulate(200) { i =>
      (i.toLong, s"k${rnd.nextInt(5)}",
        new java.sql.Timestamp((base + rnd.nextLong() % (86400L * 1000000L)) / 1000))
    }.toDF("event_id", "k", "ts")
    val r = Seq.tabulate(60) { i =>
      val s = base + rnd.nextLong() % (86400L * 1000000L)
      (i.toLong, s"k${rnd.nextInt(5)}",
        new java.sql.Timestamp(s / 1000),
        new java.sql.Timestamp((s + rnd.nextInt(8 * 3600) * 1000000L) / 1000))
    }.toDF("iv_id", "ik", "w_start", "w_end")
    val bucketed = join(l, r).select("event_id", "iv_id")
    val naive = l.join(r,
        $"k" === $"ik" && $"ts" >= $"w_start" && $"ts" < $"w_end")
      .select("event_id", "iv_id")
    assert(bucketed.except(naive).count() === 0L)
    assert(naive.except(bucketed).count() === 0L)
    assert(naive.count() > 0L) // fixture actually exercises matches
  }

  private def livs(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("l_id", "k", "a_start", "a_end")
      .withColumn("a_start", $"a_start".cast("timestamp"))
      .withColumn("a_end", $"a_end".cast("timestamp"))

  private def ojoin(l: DataFrame, r: DataFrame,
                    bucket: Long = HourMicros): DataFrame =
    Ranges.bucketedIntervalOverlapJoin(l, r, "k", "ik",
      "a_start", "a_end", "w_start", "w_end", bucket)

  test("overlap join: half-open boundaries — touching intervals do not match") {
    val l = livs(
      (1L, "a", "2024-01-01 08:00:00", "2024-01-01 10:00:00"), // touches
      (2L, "a", "2024-01-01 09:00:00", "2024-01-01 11:00:00"), // overlaps
      (3L, "a", "2024-01-01 12:00:00", "2024-01-01 13:00:00"), // after
      (4L, "b", "2024-01-01 10:30:00", "2024-01-01 11:00:00")) // other key
    val r = ivs((10L, "a", "2024-01-01 10:00:00", "2024-01-01 12:00:00"))
    val got = ojoin(l, r).select("l_id").as[Long].collect().toSet
    assert(got === Set(2L))
  }

  test("overlap join: multi-bucket intersection emits the pair EXACTLY once") {
    // both intervals span 6 shared hourly buckets — the canonical-
    // bucket rule must keep one row, not six
    val l = livs((1L, "a", "2024-01-01 00:00:00", "2024-01-01 08:00:00"))
    val r = ivs((10L, "a", "2024-01-01 01:00:00", "2024-01-01 07:00:00"))
    val got = ojoin(l, r).collect()
    assert(got.length === 1)
  }

  test("overlap join: empty intervals on either side match nothing") {
    val l = livs(
      (1L, "a", "2024-01-01 10:00:00", "2024-01-01 10:00:00"),
      (2L, "a", "2024-01-01 09:00:00", "2024-01-01 11:00:00"))
    val r = ivs(
      (10L, "a", "2024-01-01 09:30:00", "2024-01-01 09:30:00"),
      (11L, "a", "2024-01-01 10:00:00", "2024-01-01 10:30:00"))
    val got = ojoin(l, r).select("l_id", "iv_id")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 11L)))
  }

  test("overlap join matches the naive theta-join on randomized data (property)") {
    val rnd = new scala.util.Random(61)
    val base = 1704067200000000L
    def mk(n: Int, maxLenH: Int) = Seq.tabulate(n) { i =>
      val s = base + math.abs(rnd.nextLong()) % (86400L * 1000000L)
      (i.toLong, s"k${rnd.nextInt(4)}",
        new java.sql.Timestamp(s / 1000),
        new java.sql.Timestamp((s + rnd.nextInt(maxLenH * 3600) * 1000000L) / 1000))
    }
    val l = mk(120, 6).toDF("l_id", "k", "a_start", "a_end")
    val r = mk(50, 9).toDF("iv_id", "ik", "w_start", "w_end")
    val bucketed = ojoin(l, r).select("l_id", "iv_id")
    val naive = l.join(r,
        $"k" === $"ik" && $"a_start" < $"w_end" && $"w_start" < $"a_end")
      .select("l_id", "iv_id")
    assert(bucketed.except(naive).count() === 0L)
    assert(naive.except(bucketed).count() === 0L)
    assert(naive.count() > 0L)
    // pair-once: bucketed emits no duplicate rows
    assert(bucketed.count() === bucketed.distinct().count())
  }

  test("overlap join: colliding interval column names are rejected") {
    val l = livs((1L, "a", "2024-01-01 00:00:00", "2024-01-01 01:00:00"))
    intercept[IllegalArgumentException] {
      Ranges.bucketedIntervalOverlapJoin(l, l, "k", "k",
        "a_start", "a_end", "a_start", "a_end", HourMicros)
    }
  }
}
