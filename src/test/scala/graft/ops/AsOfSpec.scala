package graft.ops

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches the latest right row at or before each left time") {
    val quotes = Seq( // (key, time, px)
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
      ("B", 4L, 99.0)).toDF("sym", "t", "px")
    val trades = Seq( // (key, time, qty)
      ("A", 0L, 1L),  // before any quote -> null
      ("A", 5L, 2L),  // equal time -> inclusive match (px=11)
      ("A", 7L, 3L),  // between quotes -> px=11
      ("A", 99L, 4L), // after all -> px=12
      ("B", 3L, 5L),  // before B's only quote -> null
      ("C", 1L, 6L)). // key with no right rows -> null
      toDF("sym", "t", "qty")
    val got = AsOf.asofJoin(trades, quotes, "sym", "sym", "t", "t", Seq("px"))
      .orderBy("sym", "t")
      .select("sym", "t", "qty", "px")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(got === Seq(
      ("A", 0L, 1L, None), ("A", 5L, 2L, Some(11.0)), ("A", 7L, 3L, Some(11.0)),
      ("A", 99L, 4L, Some(12.0)), ("B", 3L, 5L, None), ("C", 1L, 6L, None)))
  }

  test("asofJoin preserves every left row exactly once") {
    val left = Seq(("k", 1L, "x"), ("k", 1L, "y")).toDF("k", "t", "v")
    val right = Seq(("k", 0L, 7L)).toDF("k", "t", "p")
    val got = AsOf.asofJoin(left, right, "k", "k", "t", "t", Seq("p"))
    assert(got.count() === 2L)
    assert(got.select("p").as[Long].collect().toSeq === Seq(7L, 7L))
  }

  test("asofJoinForward: earliest at-or-after, inclusive ties, tolerance bounds") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      ("A", ts(100), 1L), // next right at 150 (within 100 s tol)
      ("A", ts(150), 2L), // EQUAL time -> inclusive match at 150
      ("A", ts(151), 3L), // next right at 400 -> beyond 100 s tol
      ("A", ts(500), 4L), // nothing after -> null
      ("B", ts(10), 5L)   // key with no rights -> null
    ).toDF("k", "t", "id")
    val right = Seq(("A", ts(150), 15L), ("A", ts(400), 40L),
      ("A", ts(50), 5L)).toDF("k", "t", "p")
    val unbounded = AsOf.asofJoinForward(left, right, "k", "k", "t", "t",
        Seq("p"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(unbounded === Map(1L -> 15L, 2L -> 15L, 3L -> 40L,
      4L -> -1L, 5L -> -1L))
    val bounded = AsOf.asofJoinForward(left, right, "k", "k", "t", "t",
        Seq("p"), toleranceSeconds = 100L)
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(bounded === Map(1L -> 15L, 2L -> 15L, 3L -> -1L,
      4L -> -1L, 5L -> -1L))
  }

  test("asofJoinTolerance: stale backward matches revert to null") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(("A", ts(100), 1L), ("A", ts(500), 2L))
      .toDF("k", "t", "id")
    val right = Seq(("A", ts(90), 9L)).toDF("k", "t", "p")
    val got = AsOf.asofJoinTolerance(left, right, "k", "k", "t", "t",
        Seq("p"), toleranceSeconds = 60L)
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // 100 is 10 s after 90 (in tol); 500 is 410 s after (stale)
    assert(got === Map(1L -> 9L, 2L -> -1L))
  }

  test("asofJoinNearest: closer side wins, equidistant backward, tolerance per side") {
    val quotes = Seq(("A", 10L, 100L), ("A", 20L, 200L), ("B", 50L, 500L))
      .toDF("sym", "t", "px")
    val trades = Seq(
      (1L, "A", 14L), // back gap 4 < fwd gap 6 -> 100
      (2L, "A", 16L), // fwd gap 4 < back gap 6 -> 200
      (3L, "A", 15L), // equidistant -> BACKWARD -> 100
      (4L, "A", 3L),  // nothing behind -> forward 100
      (5L, "A", 25L), // nothing ahead -> backward 200
      (6L, "C", 9L))  // no right rows -> null
      .toDF("id", "sym", "t")
    val got = AsOf.asofJoinNearest(trades, quotes, "sym", "sym", "t", "t",
        Seq("px"))
      .select("id", "px").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> 100L, 2L -> 200L, 3L -> 100L, 4L -> 100L,
      5L -> 200L, 6L -> -1L))
    // tolerance bounds BOTH directions: gap 7 s > 5 s -> null,
    // gap 5 s (id 5) stays
    val tol = AsOf.asofJoinNearest(trades, quotes, "sym", "sym", "t", "t",
        Seq("px"), toleranceSeconds = 5L)
      .select("id", "px").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(tol === Map(1L -> 100L, 2L -> 200L, 3L -> 100L, 4L -> -1L,
      5L -> 200L, 6L -> -1L))
  }
}
