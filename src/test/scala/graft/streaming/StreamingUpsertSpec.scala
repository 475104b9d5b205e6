package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions.col
import graft.SparkSpec
import graft.ops.Dedup

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("streaming LWW upsert converges to latest per key and is idempotent (S4/D2)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Long, String)]
    val table = tmp("upsert_table") + "/t"
    val q = StreamingUpsert.upsertQuery(
      in.toDF().toDF("k", "v", "payload"),
      "k", "v", "payload", table, tmp("upsert_ckpt"))
    try {
      in.addData(("a", 1L, "a1"), ("b", 1L, "b1"))
      q.processAllAvailable()
      in.addData(("a", 2L, "a2"), ("c", 1L, "c1"))
      q.processAllAvailable()
      // replay the same data -> same converged state (idempotent upsert)
      in.addData(("a", 2L, "a2"), ("b", 1L, "b1"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(table)
      .orderBy("k").as[(String, Long, String)].collect().toSeq
    assert(got === Seq(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 1L, "c1")))
  }

  test("streaming upsert over N micro-batches equals batch lastWriteWins (property)") {
    // Batch/streaming equivalence: merging micro-batches incrementally
    // must converge to the same state as one batch LWW over the whole
    // input — max_by on (order, id) is associative, so the incremental
    // fold and the global aggregate agree even under ties. Randomized
    // with a fixed seed; keys collide across batches by construction.
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(20260812L)
    val rows = Seq.fill(120)(
      (s"k${rnd.nextInt(15)}", rnd.nextInt(20).toLong, s"p${rnd.nextInt(8)}"))
    val in = MemoryStream[(String, Long, String)]
    val table = tmp("upsert_prop_table") + "/t"
    val q = StreamingUpsert.upsertQuery(
      in.toDF().toDF("k", "v", "payload"),
      "k", "v", "payload", table, tmp("upsert_prop_ckpt"))
    try {
      rows.grouped(30).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(table)
      .as[(String, Long, String)].collect().toSet
    val batch = Dedup.lastWriteWins(
      rows.toDF("k", "v", "payload"), "k", "v", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size === rows.map(_._1).distinct.size)
  }

  test("dedupWithinWatermark drops repeated keys across batches (D1)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = StreamingUpsert.dedupWithinWatermark(
      in.toDF().toDF("k", "ts"), "k", "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 10:05:00")
      in.addData(("x", t0), ("y", t0))
      q.processAllAvailable()
      in.addData(("x", t1), ("z", t1)) // x is a dup within the watermark
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT k FROM dedup_out").as[String].collect().sorted
    assert(got.toSeq === Seq("x", "y", "z"))
  }

  test("watermarked hourly window counts (streaming q15 shape)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val out = StreamingUpsert.hourlyCounts(
      in.toDF().toDF("ts", "event_type"), "ts", "event_type", "10 minutes")
    val q = out.writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click"),
        (Timestamp.valueOf("2024-01-01 10:40:00"), "click"),
        (Timestamp.valueOf("2024-01-01 11:10:00"), "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql(
      "SELECT event_type, n FROM hourly_out ORDER BY event_type")
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("click", 2L), ("view", 1L)))
  }

  test("sessionCounts merges events within the gap and splits across it") {
    // Streaming counterpart of batch Sessions.sessionize (q34): events
    // 10 min apart with a 15-min gap merge into one session; a 40-min
    // silence starts a new one. Watermark far past the last event
    // finalizes both windows for append-mode emission.
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = StreamingUpsert.sessionCounts(
      in.toDF().toDF("user_id", "ts"), "user_id", "ts", "15 minutes",
      "5 minutes")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        ("u1", Timestamp.valueOf("2024-01-01 10:00:00")),
        ("u1", Timestamp.valueOf("2024-01-01 10:10:00")), // merges
        ("u1", Timestamp.valueOf("2024-01-01 11:00:00")), // new session
        ("u2", Timestamp.valueOf("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // advance the watermark far enough to close every session
      in.addData(("u3", Timestamp.valueOf("2024-01-01 23:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql(
      "SELECT user_id, n_events FROM sess_out ORDER BY user_id, n_events")
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("u1", 1L), ("u1", 2L), ("u2", 1L)))
  }

  test("intervalJoin: stream-stream within tolerance equals the batch interval join") {
    implicit val sql = spark.sqlContext
    val lin = MemoryStream[(Long, Timestamp, String)]
    val rin = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingUpsert.intervalJoin(
      lin.toDF().toDF("k", "ts", "v"), rin.toDF().toDF("k", "ts", "v"),
      "k", "ts", "v", toleranceSeconds = 60L, delay = "30 seconds")
    val q = out.writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append).start()
    def t(s: String) = Timestamp.valueOf(s)
    val lRows = Seq(
      (1L, t("2024-01-01 10:00:00"), "l1"),
      (1L, t("2024-01-01 10:05:00"), "l2"),
      (2L, t("2024-01-01 10:00:30"), "l3"))
    val rRows = Seq(
      (1L, t("2024-01-01 10:00:45"), "r1"), // within 60s of l1 only
      (1L, t("2024-01-01 10:04:30"), "r2"), // within 60s of l2 only
      (2L, t("2024-01-01 10:02:00"), "r3"), // 90s from l3 -> no match
      (3L, t("2024-01-01 10:00:00"), "r4")) // key never on the left
    try {
      // interleaved, out-of-order arrival across batches
      lin.addData(lRows(0)); rin.addData(rRows(2))
      q.processAllAvailable()
      rin.addData(rRows(0), rRows(3)); lin.addData(lRows(2))
      q.processAllAvailable()
      lin.addData(lRows(1)); rin.addData(rRows(1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT key, l_value, r_value FROM ij_out")
      .as[(Long, String, String)].collect().toSet
    // batch reference over the same rows
    val want = (for {
      (lk, lt, lv) <- lRows; (rk, rt, rv) <- rRows
      if lk == rk && math.abs(lt.getTime - rt.getTime) <= 60000L
    } yield (lk, lv, rv)).toSet
    assert(got === want)
    assert(want === Set((1L, "l1", "r1"), (1L, "l2", "r2")))
  }

  test("incrementalNearDup over N micro-batches equals batch minhashLshPairs (property)") {
    // Streaming/batch equivalence for the flagship dedup path: feeding
    // the corpus through the persisted-signature-table incremental
    // operator in 3 micro-batches must produce exactly the pair set of
    // one batch LSH run over the whole corpus. Docs are shuffled with a
    // fixed seed so near-dup pairs are split ACROSS batches — the
    // new-vs-old join path is genuinely exercised.
    implicit val sql = spark.sqlContext
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    def doc(t: Int, v: Int): String = {
      val base = (0 until 12)
        .map(i => words((t * 3 + i) % words.length) + t).mkString(" ")
      if (v == 0) base else s"$base variant$v"
    }
    val docs = (for (t <- 0 until 6; v <- 0 until 3)
      yield ((t * 10 + v).toLong, doc(t, v))).toSeq
    val rnd = new scala.util.Random(42)
    val shuffled = rnd.shuffle(docs)
    val base = tmp("incr_neardup")
    val in = MemoryStream[(Long, String)]
    val q = StreamingUpsert.incrementalNearDup(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 2, tau = 0.5,
      basePath = base, checkpoint = tmp("incr_neardup_ckpt"))
    val batchOf = shuffled.grouped(6).zipWithIndex
      .flatMap { case (b, i) => b.map(d => d._1 -> i) }.toMap
    try {
      shuffled.grouped(6).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(s"$base/pairs")
      .select("doc_a", "doc_b").distinct()
      .as[(Long, Long)].collect().toSet
    val batch = Dedup.minhashLshPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, bands = 4, rowsPerBand = 2, tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // the shuffle really did split at least one pair across batches
    assert(streamed.exists { case (a, b) => batchOf(a) != batchOf(b) })
  }

  test("nearDupBatchCompacted + compactLshState equals batch minhashLshPairs (property)") {
    // the state-shuffle-free incremental LSH: same corpus/protocol as
    // the incrementalNearDup property, but fed through the compacted
    // form with a mid-stream compaction, a post-compaction batch, and
    // a cross-batch re-delivery — the pair set must still be exactly
    // the batch operator's.
    implicit val sql = spark.sqlContext
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    def doc(t: Int, v: Int): String = {
      val base = (0 until 12)
        .map(i => words((t * 3 + i) % words.length) + t).mkString(" ")
      if (v == 0) base else s"$base variant$v"
    }
    val docs = (for (t <- 0 until 6; v <- 0 until 3)
      yield ((t * 10 + v).toLong, doc(t, v))).toSeq
    val rnd = new scala.util.Random(42)
    val shuffled = rnd.shuffle(docs)
    val base = tmp("compact_neardup")
    val (setsT, bktT) = ("compact_lsh_sets", "compact_lsh_buckets")
    def feed(b: Seq[(Long, String)], id: Long): Unit =
      StreamingUpsert.nearDupBatchCompacted(spark,
        b.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 2, tau = 0.5,
        basePath = base, setsTable = setsT, bucketsTable = bktT,
        batchId = id)
    try {
      val slices = shuffled.grouped(6).toSeq
      feed(slices(0), 0)
      StreamingUpsert.compactLshState(spark, base, setsT, bktT,
        numBuckets = 4)
      // post-compaction batches join against the bucketed tables;
      // batch 2 re-delivers a batch-0 doc (dropped by the seen gate)
      feed(slices(1), 1)
      feed(slices(2) ++ slices(0).take(1), 2)
      val streamed = StreamingUpsert.nearDupPairsFromState(spark, base)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val batch = Dedup.minhashLshPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 3, bands = 4, rowsPerBand = 2, tau = 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // replaying the last batch changes nothing (overwrite + seen
      // predecessor rules)
      feed(slices(2) ++ slices(0).take(1), 2)
      val replayed = StreamingUpsert.nearDupPairsFromState(spark, base)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(replayed === streamed)
      // a second compaction folds the remaining deltas; the tables
      // then hold exactly the batch builder's rows
      StreamingUpsert.compactLshState(spark, base, setsT, bktT,
        numBuckets = 4)
      val tblSets = spark.table(setsT).select($"doc_id")
        .as[Long].collect().toSet
      assert(tblSets === docs.map(_._1).toSet)
    } finally Seq(setsT, bktT).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("incrementalSpanDedup over N micro-batches equals batch dropRepeatedSpans (property)") {
    // Streaming/batch equivalence for span dedup: feeding documents in
    // 3 micro-batches and reconstructing from state must EXACTLY equal
    // one batch dropRepeatedSpans over the union — count and min-key
    // merge losslessly, so unlike the LSH cap there is no divergence
    // case. The repeated 4-token boilerplate block is planted across
    // batches so the keeper (global min key) arrives in a different
    // batch than later copies.
    implicit val sql = spark.sqlContext
    val boiler = "all rights reserved copyright"
    def doc(i: Int): String =
      if (i % 2 == 0) s"$boiler unique$i content$i words$i here$i"
      else s"fresh$i text$i body$i prose$i $boiler"
    val docs = (0 until 12).map(i => (i.toLong, doc(i)))
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(docs)
    val base = tmp("incr_span")
    val in = MemoryStream[(Long, String)]
    val q = StreamingUpsert.incrementalSpanDedup(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      spanTokens = 4, basePath = base, checkpoint = tmp("incr_span_ckpt"))
    try {
      shuffled.grouped(4).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = StreamingUpsert.spanDedupFromState(spark, base, minRepeat = 2L)
      .as[(Long, Long, Long, String)].collect().toSet
    val batch = Dedup.dropRepeatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", spanTokens = 4, minRepeat = 2L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size === 12)
    // the boilerplate block really was dropped somewhere (kept < blocks)
    assert(streamed.exists(r => r._3 < r._2))
    // only the latest stats version plus its predecessor survive pruning
    assert(new java.io.File(s"$base/stats").listFiles().count(_.isDirectory) <= 2)
  }

  test("compactSpanState: table+delta serve equals batch dropRepeatedSpans; resurrected dirs excluded") {
    implicit val sql = spark.sqlContext
    val boiler = "all rights reserved copyright"
    def doc(i: Int): String =
      if (i % 2 == 0) s"$boiler unique$i content$i words$i here$i"
      else s"fresh$i text$i body$i prose$i $boiler"
    val docs = (0 until 12).map(i => (i.toLong, doc(i)))
    val base = tmp("compact_span")
    val tbl = "compact_span_blk"
    def feed(b: Seq[(Long, String)], id: Long): Unit =
      StreamingUpsert.spanStateBatch(spark, b.toDF("doc_id", "text"),
        "doc_id", "text", spanTokens = 4, id, base)
    def served() = StreamingUpsert.spanDedupFromCompactedState(spark,
        base, tbl, minRepeat = 2L)
      .as[(Long, Long, Long, String)].collect().toSet
    try {
      val slices = docs.grouped(4).toSeq
      feed(slices(0), 0); feed(slices(1), 1)
      StreamingUpsert.compactSpanState(spark, base, tbl, numBuckets = 4)
      // folded dirs gone; marker recorded
      assert(!new java.io.File(s"$base/blocks").listFiles()
        .exists(f => f.isDirectory && f.getName.startsWith("batch=")))
      feed(slices(2), 2) // delta
      val batch = Dedup.dropRepeatedSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", spanTokens = 4, minRepeat = 2L)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(served() === batch)
      StreamingUpsert.compactSpanState(spark, base, tbl, numBuckets = 4)
      assert(served() === batch)
      // the realistic resurrection: the stream crashed after batch 2's
      // dir write but before its checkpoint commit, compaction folded
      // the completed dir, and the restart REPLAYS batch 2 — its dir
      // reappears with id ≤ the high-water marker and must be excluded
      // (its rows are already in the table; double block rows would
      // corrupt the reassembly)
      feed(slices(2), 2)
      assert(new java.io.File(s"$base/blocks/batch=2").exists())
      assert(served() === batch)
      // the next compaction deletes the stale dir without re-folding
      StreamingUpsert.compactSpanState(spark, base, tbl, numBuckets = 4)
      assert(!new java.io.File(s"$base/blocks").listFiles()
        .exists(f => f.isDirectory && f.getName.startsWith("batch=")))
      assert(served() === batch)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("spanStateBatch replay: re-running a batch leaves state unchanged (idempotent)") {
    // The ADVICE r4 pattern under test: blocks/batch=<id> and
    // stats/v=<id> are OVERWRITTEN on replay and v=<id> is rebuilt from
    // its predecessor, so a re-run cannot double-count block
    // populations (unlike append-only state).
    val b1 = Seq((1L, "red green blue yellow common block text here"),
      (2L, "common block text here and some more words"))
    val b2 = Seq((3L, "common block text here third arrival now yes"))
    val base = tmp("span_replay")
    def run(b: Seq[(Long, String)], id: Long): Unit =
      StreamingUpsert.spanStateBatch(spark, b.toDF("doc_id", "text"),
        "doc_id", "text", spanTokens = 4, batchId = id, basePath = base)
    run(b1, 0L)
    run(b1, 0L) // simulated replay of batch 0
    run(b2, 1L)
    run(b2, 1L) // simulated replay of batch 1
    val streamed = StreamingUpsert.spanDedupFromState(spark, base, minRepeat = 2L)
      .as[(Long, Long, Long, String)].collect().toSet
    val batch = Dedup.dropRepeatedSpans((b1 ++ b2).toDF("doc_id", "text"),
        "doc_id", "text", spanTokens = 4, minRepeat = 2L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size === 3)
  }

  test("spanStateBatch: a doc_id re-delivered in a LATER batch is dropped (first wins)") {
    // Cross-batch at-least-once delivery (not a same-batchId replay):
    // without the seen-set anti-join, doc 2's blocks would count twice
    // in the stats and reassemble twice (ADVICE r5). The re-delivered
    // copy even carries DIFFERENT text — first occurrence must win.
    val b1 = Seq((1L, "red green blue yellow common block text here"),
      (2L, "common block text here and some more words"))
    val b2 = Seq((2L, "mutated re-delivery of doc two changed text"),
      (3L, "common block text here third arrival now yes"))
    val base = tmp("span_redelivery")
    StreamingUpsert.spanStateBatch(spark, b1.toDF("doc_id", "text"),
      "doc_id", "text", spanTokens = 4, batchId = 0L, basePath = base)
    StreamingUpsert.spanStateBatch(spark, b2.toDF("doc_id", "text"),
      "doc_id", "text", spanTokens = 4, batchId = 1L, basePath = base)
    val streamed = StreamingUpsert.spanDedupFromState(spark, base, minRepeat = 2L)
      .as[(Long, Long, Long, String)].collect().toSet
    // equals the batch operator over the FIRST-occurrence union
    val firstWins = b1 ++ b2.filterNot(d => b1.exists(_._1 == d._1))
    val batch = Dedup.dropRepeatedSpans(firstWins.toDF("doc_id", "text"),
        "doc_id", "text", spanTokens = 4, minRepeat = 2L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size === 3)
    // doc 2 reassembles from its ORIGINAL text, not the mutated copy
    assert(streamed.find(_._1 == 2L).exists(_._4.contains("some more words")))
  }

  test("nearDupBatch replay: duplicated appends collapse under distinct-at-read") {
    // The documented at-least-once contract: a replayed micro-batch
    // re-appends value-identical rows to pairs/ AND sets/buckets/, and
    // DISTINCT at read restores exactly-once — even though the
    // duplicated signature rows multiply the candidate and verify
    // joins of every LATER batch.
    val words = Seq("kilo", "lima", "mike", "november", "oscar",
      "papa", "quebec", "romeo", "sierra", "tango")
    def doc(t: Int, v: Int): String = {
      val base = (0 until 12)
        .map(i => words((t * 3 + i) % words.length) + t).mkString(" ")
      if (v == 0) base else s"$base variant$v"
    }
    val b1 = (for (t <- 0 until 3; v <- 0 until 2)
      yield ((t * 10 + v).toLong, doc(t, v))).toSeq
    val b2 = (for (t <- 0 until 3) yield ((t * 10 + 2).toLong, doc(t, 2))).toSeq
    val base = tmp("neardup_replay")
    def run(b: Seq[(Long, String)]): Unit =
      StreamingUpsert.nearDupBatch(spark, b.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, bands = 4, rowsPerBand = 2, tau = 0.5,
        basePath = base)
    run(b1)
    run(b1) // simulated replay: same batch appended twice
    run(b2)
    val streamed = spark.read.parquet(s"$base/pairs")
      .select("doc_a", "doc_b").distinct()
      .as[(Long, Long)].collect().toSet
    val batch = Dedup.minhashLshPairs((b1 ++ b2).toDF("doc_id", "text"),
        "doc_id", "text", n = 3, bands = 4, rowsPerBand = 2, tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // and the raw (non-distinct) pairs table really does contain dups
    assert(spark.read.parquet(s"$base/pairs").count() > streamed.size)
  }

  test("nearDupBatch honors maxBucket: a boilerplate cohort cannot explode") {
    // 80 identical docs in one batch land in ONE band bucket per band;
    // with the cap below the cohort size the buckets are dropped and
    // the candidate join emits nothing (the q23 maxBucket contract,
    // wired through the streaming path). Uncapped, the same batch
    // would verify C(80,2) = 3160 pairs.
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq.tabulate(80)(i => (i.toLong, boiler))
    val capped = tmp("neardup_capped")
    StreamingUpsert.nearDupBatch(spark, docs.toDF("doc_id", "text"),
      "doc_id", "text", n = 3, bands = 4, rowsPerBand = 2, tau = 0.5,
      basePath = capped, maxBucket = 10L)
    assert(spark.read.parquet(s"$capped/pairs").count() === 0L)
    val uncapped = tmp("neardup_uncapped")
    StreamingUpsert.nearDupBatch(spark, docs.toDF("doc_id", "text"),
      "doc_id", "text", n = 3, bands = 4, rowsPerBand = 2, tau = 0.5,
      basePath = uncapped, maxBucket = 100000L)
    assert(spark.read.parquet(s"$uncapped/pairs").count() === 3160L)
  }

  test("incrementalPqEncode over N micro-batches equals batch pqEncode (property)") {
    // Frozen codebooks + per-row encoding => union of per-batch
    // encodes EXACTLY equals the batch encode of the union; the codes
    // accumulated from state must serve knnPqOnCodes identically.
    implicit val sql = spark.sqlContext
    import graft.ops.Similarity
    val rnd = new scala.util.Random(29)
    val dims = 8
    val vecs = (0L until 30L).map(i =>
      (i, Seq.fill(dims)((rnd.nextDouble() * 10 - 5).toFloat)))
    val all = vecs.toDF("vec_id", "embedding")
    val p = Similarity.prepared(all, "vec_id", "embedding")
    // codebooks trained ONCE (on the initial corpus), then frozen
    val cb = Similarity.pqCodebooksTrained(p, m = 4, dims = dims,
      stride = 10L, iters = 1).cache()
    cb.count()
    val base = tmp("incr_pq")
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingUpsert.incrementalPqEncode(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cb, m = 4, dims = dims, basePath = base,
      checkpoint = tmp("incr_pq_ckpt"))
    try {
      rnd.shuffle(vecs).grouped(10).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = StreamingUpsert.pqCodesFromState(spark, base)
      .as[(Long, Seq[Long])].collect().toMap
    val batch = Similarity.pqEncode(p, cb, 4, dims)
      .as[(Long, Seq[Long])].collect().toMap
    assert(streamed === batch)
    assert(streamed.size === 30)
    // the state-backed codes serve ADC identically to the inline path
    val qs = p.filter(col("vec_id") < 2)
    val served = Similarity.knnPqOnCodes(
        StreamingUpsert.pqCodesFromState(spark, base), qs, cb, 4, dims, 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSet
    val inline = Similarity.knnPq(p, qs, cb, 4, dims, 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSet
    assert(served === inline)
  }

  test("incrementalSemDedup over shuffled micro-batches equals batch semDedup (property)") {
    // The drop rule is order-free on IDS, not arrival: feeding the
    // corpus in SHUFFLED order forces the retroactive case (a late
    // small id dropping an already-arrived larger id) through the
    // new-vs-old join direction.
    implicit val sql = spark.sqlContext
    import graft.ops.Similarity
    val rnd = new scala.util.Random(37)
    val dims = 8
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(dims)((rnd.nextDouble() * 2 - 1).toFloat)))
    val p = Similarity.prepared(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    // centroids frozen ONCE over the full corpus (the asset contract)
    val cents = Similarity.strideCentroids(p, 9L).cache()
    cents.count()
    val tau = 0.4
    val base = tmp("incr_semdedup")
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingUpsert.incrementalSemDedup(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, tau, base, checkpoint = tmp("incr_semdedup_ckpt"))
    try {
      rnd.shuffle(vecs).grouped(9).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = StreamingUpsert.semDedupFromState(spark, base)
      .as[(Long, Long, Boolean)].collect().toSet
    val batch = Similarity.semDedup(p, cents, tau)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size === 40)
    assert(streamed.exists(!_._3), "fixture must exercise drops")
  }

  test("semDedupBatch replay re-appends value-identical state (idempotent at read)") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(41)
    val dims = 8
    val vecs = (0L until 24L).map(i =>
      (i, Seq.fill(dims)((rnd.nextDouble() * 2 - 1).toFloat)))
    val p = Similarity.prepared(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val cents = Similarity.strideCentroids(p, 7L).cache()
    cents.count()
    val base = tmp("semdedup_replay")
    val (b1, b2) = vecs.splitAt(15)
    def run(b: Seq[(Long, Seq[Float])]): Unit =
      StreamingUpsert.semDedupBatch(spark,
        Similarity.prepared(b.toDF("vec_id", "embedding"),
          "vec_id", "embedding"), cents, 0.4, base)
    run(b1)
    run(b1) // replayed micro-batch: value-identical appends
    run(b2)
    val got = StreamingUpsert.semDedupFromState(spark, base)
      .as[(Long, Long, Boolean)].collect().toSet
    val want = Similarity.semDedup(p, cents, 0.4)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === want)
    assert(got.size === 24)
  }

  test("semDedupBatchCompacted + compactSemDedupState equals batch semDedup; re-delivery gated") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(47)
    val dims = 8
    val vecs = (0L until 36L).map(i =>
      (i, Seq.fill(dims)((rnd.nextDouble() * 2 - 1).toFloat)))
    val p = Similarity.prepared(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val cents = Similarity.strideCentroids(p, 8L).cache()
    cents.count()
    val base = tmp("semdedup_compact")
    val (vecsT, dropsT) = ("semdedup_cvecs_spec", "semdedup_cdrops_spec")
    try {
      def feed(b: Seq[(Long, Seq[Float])], id: Long): Unit =
        StreamingUpsert.semDedupBatchCompacted(spark,
          Similarity.prepared(b.toDF("vec_id", "embedding"),
            "vec_id", "embedding"), cents, 0.4, base, vecsT, id)
      // shuffled arrival, compaction mid-stream, replay of batch 1,
      // and a cross-batch re-delivery (seen gate)
      val shuffled = rnd.shuffle(vecs)
      val (b0, rest) = shuffled.splitAt(12)
      val (b1, b2) = rest.splitAt(12)
      feed(b0, 0L)
      StreamingUpsert.compactSemDedupState(spark, base, vecsT, dropsT)
      feed(b1, 1L)
      feed(b1, 1L) // same-batchId replay: overwrite, idempotent
      feed(b2 ++ b0.take(3), 2L) // re-delivery of 3 compacted vecs
      val got = StreamingUpsert.semDedupServeCompacted(spark, base,
        vecsT, dropsT).as[(Long, Long, Boolean)].collect().toSet
      val want = Similarity.semDedup(p, cents, 0.4)
        .as[(Long, Long, Boolean)].collect().toSet
      assert(got === want)
      assert(got.size === 36)
      assert(got.exists(!_._3), "fixture must exercise drops")
      // a second compaction folds the remaining deltas; serve unchanged
      StreamingUpsert.compactSemDedupState(spark, base, vecsT, dropsT)
      val got2 = StreamingUpsert.semDedupServeCompacted(spark, base,
        vecsT, dropsT).as[(Long, Long, Boolean)].collect().toSet
      assert(got2 === want)
    } finally {
      Seq(vecsT, dropsT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  test("pqEncodeBatch replay + cross-batch re-delivery collapse under distinct-at-read") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(31)
    val dims = 8
    val vecs = (0L until 20L).map(i =>
      (i, Seq.fill(dims)((rnd.nextDouble() * 10 - 5).toFloat)))
    val all = vecs.toDF("vec_id", "embedding")
    val p = Similarity.prepared(all, "vec_id", "embedding")
    val cb = Similarity.pqCodebooks(p, m = 4, dims = dims, stride = 10L)
      .cache()
    cb.count()
    val base = tmp("pq_replay")
    def run(b: Seq[(Long, Seq[Float])], id: Long): Unit =
      StreamingUpsert.pqEncodeBatch(spark, b.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cb, 4, dims, id, base)
    val (b1, b2) = vecs.splitAt(12)
    run(b1, 0L)
    run(b1, 0L)            // same-batchId replay: overwrite, idempotent
    run(b2 ++ b1.take(3), 1L) // cross-batch re-delivery of 3 vectors
    val streamed = StreamingUpsert.pqCodesFromState(spark, base)
      .as[(Long, Seq[Long])].collect()
    // distinct-at-read: one row per vec_id despite the re-delivery
    assert(streamed.length === 20)
    assert(streamed.toMap ===
      Similarity.pqEncode(p, cb, 4, dims).as[(Long, Seq[Long])].collect().toMap)
  }

  test("incrementalPqIndex state serves IVF-PQ identically to the batch index (property)") {
    implicit val sql = spark.sqlContext
    import graft.ops.Similarity
    val rnd = new scala.util.Random(37)
    val dims = 8
    val vecs = (0L until 30L).map(i =>
      (i, Seq.fill(dims)((rnd.nextDouble() * 10 - 5).toFloat)))
    val all = vecs.toDF("vec_id", "embedding")
    val p = Similarity.prepared(all, "vec_id", "embedding")
    // both quantizers trained once, then frozen across batches
    val coarse = Similarity.strideCentroids(p, 10L).cache()
    val cb = Similarity.pqCodebooks(p, m = 4, dims = dims, stride = 10L)
      .cache()
    coarse.count(); cb.count()
    val base = tmp("incr_pq_idx")
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingUpsert.incrementalPqIndex(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      coarse, cb, m = 4, dims = dims, basePath = base,
      checkpoint = tmp("incr_pq_idx_ckpt"))
    try {
      rnd.shuffle(vecs).grouped(10).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val qs = p.filter(col("vec_id") < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Long)].collect().toSet
    val served = rows(Similarity.knnIvfPqOnCodes(
      StreamingUpsert.pqIndexFromState(spark, base), qs, coarse, cb,
      m = 4, dims = dims, k = 5, nProbe = 2))
    val inline = rows(Similarity.knnIvfPq(p, qs, coarse, cb,
      m = 4, dims = dims, k = 5, nProbe = 2))
    assert(served.nonEmpty)
    assert(served === inline)
    // and the state rows ARE the batch builder's rows
    val stateRows = StreamingUpsert.pqIndexFromState(spark, base)
      .as[(Long, Long, Seq[Long])].collect().toSet
    val batchRows = Similarity.pqIndexRows(p, coarse, cb, 4, dims)
      .as[(Long, Long, Seq[Long])].collect().toSet
    assert(stateRows === batchRows)
  }

  test("incrementalPqResidualIndex state serves residual IVF-PQ identically to the batch index (property)") {
    implicit val sql = spark.sqlContext
    import graft.ops.Similarity
    val rnd = new scala.util.Random(43)
    val dims = 8
    val vecs = (0L until 30L).map(i =>
      (i, Seq.fill(dims)((rnd.nextDouble() * 10 - 5).toFloat)))
    val all = vecs.toDF("vec_id", "embedding")
    val p = Similarity.prepared(all, "vec_id", "embedding")
    // coarse quantizer AND residual codebooks trained once on the
    // full corpus, then frozen across batches (the FAISS contract:
    // training is a batch job, maintenance is incremental)
    val coarse = Similarity.strideCentroids(p, 10L).cache()
    val rcb = Similarity.pqCodebooks(Similarity.residualCorpus(p, coarse),
      m = 4, dims = dims, stride = 7L).cache()
    coarse.count(); rcb.count()
    val base = tmp("incr_pq_residx")
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingUpsert.incrementalPqResidualIndex(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      coarse, rcb, m = 4, dims = dims, basePath = base,
      checkpoint = tmp("incr_pq_residx_ckpt"))
    try {
      rnd.shuffle(vecs).grouped(10).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val qs = p.filter(col("vec_id") < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Long)].collect().toSet
    val served = rows(Similarity.knnIvfPqResidualOnCodes(
      StreamingUpsert.pqIndexFromState(spark, base), qs, coarse, rcb,
      m = 4, dims = dims, k = 5, nProbe = 2))
    val inline = rows(Similarity.knnIvfPqResidualOnCodes(
      Similarity.pqIndexRowsResidual(p, coarse, rcb, 4, dims),
      qs, coarse, rcb, m = 4, dims = dims, k = 5, nProbe = 2))
    assert(served.nonEmpty)
    assert(served === inline)
    // the state rows ARE the batch builder's rows — the per-batch
    // residual encode loses nothing vs encoding the union at once
    val stateRows = StreamingUpsert.pqIndexFromState(spark, base)
      .as[(Long, Long, Seq[Long])].collect().toSet
    val batchRows = Similarity.pqIndexRowsResidual(p, coarse, rcb, 4, dims)
      .as[(Long, Long, Seq[Long])].collect().toSet
    assert(stateRows === batchRows)
  }

  test("compactPqIndexState folds state into the bucketed asset; serve merges table + delta exactly") {
    implicit val sql = spark.sqlContext
    import graft.ops.Similarity
    val rnd = new scala.util.Random(53)
    val dims = 8
    val vecs = (0L until 30L).map(i =>
      (i, Seq.fill(dims)((rnd.nextDouble() * 10 - 5).toFloat)))
    val p = Similarity.prepared(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val coarse = Similarity.strideCentroids(p, 10L).cache()
    val cb = Similarity.pqCodebooks(p, m = 4, dims = dims, stride = 10L)
      .cache()
    coarse.count(); cb.count()
    val base = tmp("compact_pq_idx")
    val tbl = "compact_pq_idx_tbl"
    val slices = vecs.grouped(10).toSeq
    def feed(batch: Seq[(Long, Seq[Float])], id: Long): Unit =
      StreamingUpsert.pqIndexBatch(spark, batch.toDF("vec_id", "embedding"),
        "vec_id", "embedding", coarse, cb, m = 4, dims = dims, id, base)
    def batchDirs(): Seq[String] = {
      val d = new java.io.File(s"$base/index")
      if (!d.exists()) Seq.empty
      else d.listFiles().toSeq.filter(_.isDirectory).map(_.getName)
        .filter(_.startsWith("batch="))
    }
    val qs = p.filter(col("vec_id") < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Long)].collect().toSet
    def idxRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cent_id"), col("codes"))
        .as[(Long, Long, Seq[Long])].collect().toSet
    try {
      feed(slices(0), 0); feed(slices(1), 1)
      StreamingUpsert.compactPqIndexState(spark, base, tbl, numBuckets = 4)
      // consumed batch dirs truncated; table == batch builder's rows
      // over exactly the compacted slices
      assert(batchDirs().isEmpty)
      val p01 = Similarity.prepared(
        (slices(0) ++ slices(1)).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      assert(idxRows(spark.table(tbl)) ===
        idxRows(Similarity.pqIndexRows(p01, coarse, cb, 4, dims)))
      // no delta: serve == the persisted-index serve == inline
      val served0 = rows(StreamingUpsert.pqIndexServe(spark, base, tbl,
        qs, coarse, cb, m = 4, dims = dims, k = 5, nProbe = 2))
      assert(served0 === rows(Similarity.knnIvfPq(p01, qs, coarse, cb,
        m = 4, dims = dims, k = 5, nProbe = 2)))
      // slice 2 arrives post-compaction, and one slice-0 vector is
      // re-delivered with it (at-least-once beyond the watermark) —
      // it now exists in BOTH the table and the delta
      feed(slices(2) ++ slices(0).take(1), 2)
      assert(batchDirs() === Seq("batch=2"))
      val served1 = rows(StreamingUpsert.pqIndexServe(spark, base, tbl,
        qs, coarse, cb, m = 4, dims = dims, k = 5, nProbe = 2))
      assert(served1 === rows(Similarity.knnIvfPq(p, qs, coarse, cb,
        m = 4, dims = dims, k = 5, nProbe = 2)))
      // re-compaction folds the delta (cross-source duplicate
      // collapses: distinct rows == full batch build), and a further
      // compaction with no state is a no-op
      StreamingUpsert.compactPqIndexState(spark, base, tbl, numBuckets = 4)
      assert(batchDirs().isEmpty)
      assert(idxRows(spark.table(tbl)) ===
        idxRows(Similarity.pqIndexRows(p, coarse, cb, 4, dims)))
      StreamingUpsert.compactPqIndexState(spark, base, tbl, numBuckets = 4)
      val served2 = rows(StreamingUpsert.pqIndexServe(spark, base, tbl,
        qs, coarse, cb, m = 4, dims = dims, k = 5, nProbe = 2))
      assert(served2 === served1)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("compactPqIndexState + pqResidualIndexServe: residual family shares the compaction path") {
    implicit val sql = spark.sqlContext
    import graft.ops.Similarity
    val rnd = new scala.util.Random(61)
    val dims = 8
    val vecs = (0L until 24L).map(i =>
      (i, Seq.fill(dims)((rnd.nextDouble() * 10 - 5).toFloat)))
    val p = Similarity.prepared(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val coarse = Similarity.strideCentroids(p, 8L).cache()
    val rcb = Similarity.pqCodebooks(Similarity.residualCorpus(p, coarse),
      m = 4, dims = dims, stride = 5L).cache()
    coarse.count(); rcb.count()
    val base = tmp("compact_pq_residx")
    val tbl = "compact_pq_residx_tbl"
    val slices = vecs.grouped(12).toSeq
    def feed(batch: Seq[(Long, Seq[Float])], id: Long): Unit =
      StreamingUpsert.pqResidualIndexBatch(spark,
        batch.toDF("vec_id", "embedding"), "vec_id", "embedding",
        coarse, rcb, m = 4, dims = dims, id, base)
    val qs = p.filter(col("vec_id") < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Long)].collect().toSet
    try {
      feed(slices(0), 0)
      StreamingUpsert.compactPqIndexState(spark, base, tbl, numBuckets = 4)
      feed(slices(1), 1) // delta
      val served = rows(StreamingUpsert.pqResidualIndexServe(spark, base,
        tbl, qs, coarse, rcb, m = 4, dims = dims, k = 5, nProbe = 2))
      val inline = rows(Similarity.knnIvfPqResidualOnCodes(
        Similarity.pqIndexRowsResidual(p, coarse, rcb, 4, dims),
        qs, coarse, rcb, m = 4, dims = dims, k = 5, nProbe = 2))
      assert(served.nonEmpty)
      assert(served === inline)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("incrementalBm25Index over N micro-batches equals batch bm25MultiField (property)") {
    // df is an additive count and the corpus stats are additive sums,
    // so the versioned incremental index must score EXACTLY like the
    // batch engine over the union — including df values that straddle
    // batch boundaries (the same token arriving in every batch).
    implicit val sql = spark.sqlContext
    import graft.search.Search
    val docs = (0 until 12).map { i =>
      (i.toLong, s"spark data engine row$i " +
        (if (i % 2 == 0) "table window query" else "stream batch") +
        s" filler$i text common words")
    }
    val rnd = new scala.util.Random(41)
    val base = tmp("incr_bm25")
    val in = MemoryStream[(Long, String)]
    val q = StreamingUpsert.incrementalBm25Index(
      in.toDF().toDF("doc_id", "text"), "doc_id", Seq("text"),
      basePath = base, checkpoint = tmp("incr_bm25_ckpt"))
    try {
      rnd.shuffle(docs).grouped(4).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val toks = Seq("spark", "table", "common")
    val streamed = StreamingUpsert.bm25FromState(spark, base,
        Seq("text"), toks)
      .as[(Long, Long)].collect().toSet
    val batch = Search.bm25MultiField(docs.toDF("doc_id", "text"),
        "doc_id", Seq("text"), toks)
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // only the latest df version plus its predecessor survive pruning
    assert(new java.io.File(s"$base/df").listFiles()
      .count(_.isDirectory) <= 2)
  }

  test("compactBm25State folds postings/counts into the asset tables; serve stays exact across compactions") {
    implicit val sql = spark.sqlContext
    import graft.search.Search
    val docs = (0 until 12).map { i =>
      (i.toLong, s"spark data engine row$i " +
        (if (i % 2 == 0) "table window query" else "stream batch") +
        s" filler$i text common words")
    }
    val base = tmp("compact_bm25")
    val (postT, statT) = ("compact_bm25_post", "compact_bm25_stats")
    def feed(b: Seq[(Long, String)], id: Long): Unit =
      StreamingUpsert.bm25IndexBatch(spark, b.toDF("doc_id", "text"),
        "doc_id", Seq("text"), id, base)
    def batchDirs(sub: String): Int = {
      val d = new java.io.File(s"$base/$sub")
      if (!d.exists()) 0
      else d.listFiles().count(f => f.isDirectory &&
        f.getName.startsWith("batch="))
    }
    val toks = Seq("spark", "table", "common")
    def served() = StreamingUpsert.bm25FromCompactedState(spark, base,
        postT, statT, Seq("text"), toks)
      .as[(Long, Double)].collect().toMap
    def batchRef(n: Int) = Search.bm25MultiField(
        docs.take(n).toDF("doc_id", "text"), "doc_id", Seq("text"), toks)
      .as[(Long, Double)].collect().toMap
    try {
      val slices = docs.grouped(4).toSeq
      feed(slices(0), 0); feed(slices(1), 1)
      StreamingUpsert.compactBm25State(spark, base, postT, statT,
        numBuckets = 4)
      assert(batchDirs("postings") === 0 && batchDirs("counts") === 0)
      // df chain untouched by compaction (future batches need it)
      assert(new java.io.File(s"$base/df").exists())
      assert(served() === batchRef(8))
      // a post-compaction batch serves from table + delta...
      feed(slices(2), 2)
      assert(batchDirs("postings") === 1)
      assert(served() === batchRef(12))
      // ...and the next compaction folds it; serve unchanged
      // (pre-compaction the delta-only path equals bm25FromState —
      // the existing incremental property; post-compaction the
      // batch dirs bm25FromState reads are gone by design)
      StreamingUpsert.compactBm25State(spark, base, postT, statT,
        numBuckets = 4)
      assert(batchDirs("postings") === 0)
      assert(served() === batchRef(12))
    } finally Seq(postT, statT).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("compactPqCodesState + pqCodesServe: flat-PQ codes family shares the compaction pattern") {
    implicit val sql = spark.sqlContext
    import graft.ops.Similarity
    val rnd = new scala.util.Random(73)
    val dims = 8
    val vecs = (0L until 24L).map(i =>
      (i, Seq.fill(dims)((rnd.nextDouble() * 10 - 5).toFloat)))
    val p = Similarity.prepared(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val cb = Similarity.pqCodebooks(p, m = 4, dims = dims, stride = 8L)
      .cache()
    cb.count()
    val base = tmp("compact_pq_codes")
    val tbl = "compact_pq_codes_tbl"
    val slices = vecs.grouped(12).toSeq
    def feed(b: Seq[(Long, Seq[Float])], id: Long): Unit =
      StreamingUpsert.pqEncodeBatch(spark, b.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cb, m = 4, dims = dims, id, base)
    val qs = p.filter(col("vec_id") < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Long)].collect().toSet
    try {
      feed(slices(0), 0)
      StreamingUpsert.compactPqCodesState(spark, base, tbl)
      // delta + a re-delivered slice-0 vector (table∕delta duplicate)
      feed(slices(1) ++ slices(0).take(1), 1)
      val served = rows(StreamingUpsert.pqCodesServe(spark, base, tbl,
        qs, cb, m = 4, dims = dims, k = 5))
      val inline = rows(Similarity.knnPq(p, qs, cb, m = 4, dims = dims,
        k = 5))
      assert(served.nonEmpty)
      assert(served === inline)
      // fold the delta; serve unchanged, state dirs gone
      StreamingUpsert.compactPqCodesState(spark, base, tbl)
      assert(!new java.io.File(s"$base/codes").listFiles()
        .exists(f => f.isDirectory && f.getName.startsWith("batch=")))
      assert(rows(StreamingUpsert.pqCodesServe(spark, base, tbl,
        qs, cb, m = 4, dims = dims, k = 5)) === inline)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("bm25ClassicFromCompactedState equals the inline fuzzy classic scores") {
    implicit val sql = spark.sqlContext
    import graft.search.Search
    val docs = Seq(
      (1L, "creamy tomato soup with basil"),
      (2L, "tomato and basil pasta bake"),
      (3L, "chocolate cake with dark frosting"),
      (4L, "tomatoes roasted slowly in the oven"),
      (5L, "soup of leek and potato"))
    val base = tmp("compact_bm25_classic")
    val (postT, statT) = ("cbmc_post", "cbmc_stats")
    def feed(b: Seq[(Long, String)], id: Long): Unit =
      StreamingUpsert.bm25IndexBatch(spark, b.toDF("doc_id", "text"),
        "doc_id", Seq("text"), id, base)
    try {
      feed(docs.take(3), 0)
      StreamingUpsert.compactBm25State(spark, base, postT, statT,
        numBuckets = 2)
      feed(docs.drop(3), 1) // delta
      val query = "tomato soup"
      val served = StreamingUpsert.bm25ClassicFromCompactedState(spark,
          base, postT, statT, Seq("text"), query)
        .as[(Long, Double)].collect().toMap
      val inline = Search.bm25ClassicScores(docs.toDF("doc_id", "text"),
          "doc_id", Seq("text"), query)
        .as[(Long, Double)].collect().toMap
      assert(served.nonEmpty)
      assert(served === inline)
    } finally Seq(postT, statT).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("bm25IndexBatch: replay and cross-batch re-delivery keep scores exact") {
    import graft.search.Search
    val b1 = Seq((1L, "spark table common words here"),
      (2L, "common spark text and more spark"))
    val b2 = Seq((2L, "mutated redelivery must be ignored"),
      (3L, "table common window third doc"))
    val base = tmp("bm25_replay")
    def run(b: Seq[(Long, String)], id: Long): Unit =
      StreamingUpsert.bm25IndexBatch(spark, b.toDF("doc_id", "text"),
        "doc_id", Seq("text"), batchId = id, basePath = base)
    run(b1, 0L)
    run(b1, 0L) // same-batchId replay: overwrite + predecessor-derived df
    run(b2, 1L) // doc 2 re-delivered with different text: first wins
    run(b2, 1L)
    val toks = Seq("spark", "table", "common")
    val streamed = StreamingUpsert.bm25FromState(spark, base,
        Seq("text"), toks)
      .as[(Long, Long)].collect().toSet
    val firstWins = b1 ++ b2.filterNot(d => b1.exists(_._1 == d._1))
    val batch = Search.bm25MultiField(firstWins.toDF("doc_id", "text"),
        "doc_id", Seq("text"), toks)
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.map(_._1) === Set(1L, 2L, 3L))
  }

  test("latestPerKey custom state emits the running LWW row (mapGroupsWithState)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StreamingUpsert.KV]
    val out = StreamingUpsert.latestPerKey(in.toDS())
    val q = out.writeStream.format("memory").queryName("lww_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(StreamingUpsert.KV("a", 1L, "a1"))
      q.processAllAvailable()
      in.addData(StreamingUpsert.KV("a", 3L, "a3"),
        StreamingUpsert.KV("a", 2L, "a2")) // late lower version loses
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql(
      "SELECT payload FROM lww_out").as[String].collect().toSeq
    // update-mode emissions: a1 after batch 1, a3 after batch 2
    assert(got === Seq("a1", "a3"))
  }

  test("incrementalSummary wired as a stream equals the batch summarize of the union") {
    implicit val sql = spark.sqlContext
    import graft.ops.Summary
    val base = tmp("incr_sum")
    val in = MemoryStream[(Long, String, Double)]
    val q = StreamingUpsert.incrementalSummary(
      in.toDF().toDF("k", "g", "x"), "k", Seq("g"), Seq("x"),
      basePath = base, checkpoint = tmp("incr_sum_ckpt"))
    val rows = (0L until 900L).map(i => (i, s"g${i % 5}", (i % 40).toDouble))
    try {
      rows.grouped(300).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = StreamingUpsert.summaryFromState(spark, base)
      .select($"g", $"sum_x".cast("string"), $"cnt_x", $"min_x",
        $"max_x", $"n_rows")
      .collect().map(_.toSeq).sortBy(_.toString)
    val batch = Summary.summarize(rows.toDF("k", "g", "x"),
        Seq("g"), Seq("x"))
      .select($"g", $"sum_x".cast("string"), $"cnt_x", $"min_x",
        $"max_x", $"n_rows")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(streamed.sameElements(batch))
  }

  test("summaryStateBatch: state equals batch summarize; re-delivery dropped; replay idempotent; schema pinned") {
    import graft.ops.Summary
    val base = tmp("sum_state")
    val dims = Seq("g")
    val measures = Seq("x")
    def mk(lo: Long, hi: Long) =
      spark.range(lo, hi).select(
        $"id".as("k"),
        ($"id" % 4).cast("string").as("g"),
        ($"id" % 100).cast("double").as("x"))
    val b0 = mk(0, 400)
    val b1 = mk(400, 700)
    val b2 = mk(700, 1000)
    StreamingUpsert.summaryStateBatch(spark, b0, "k", dims, measures,
      0L, base)
    // batch 1 re-delivers half of batch 0 (at-least-once upstream):
    // the seen gate must drop every re-delivered key
    StreamingUpsert.summaryStateBatch(spark,
      b1.unionByName(mk(0, 200)), "k", dims, measures, 1L, base)
    StreamingUpsert.summaryStateBatch(spark, b2, "k", dims, measures,
      2L, base)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select($"g", $"sum_x".cast("string"), $"cnt_x", $"min_x",
          $"max_x", $"n_rows")
        .collect().map(_.toSeq).sortBy(_.toString)
    val want = snap(Summary.summarize(mk(0, 1000), dims, measures))
    assert(snap(StreamingUpsert.summaryFromState(spark, base))
      .sameElements(want), "state != batch summarize of the union")
    // same-batch replay reproduces the version exactly
    StreamingUpsert.summaryStateBatch(spark, b2, "k", dims, measures,
      2L, base)
    assert(snap(StreamingUpsert.summaryFromState(spark, base))
      .sameElements(want), "replay of the last batch changed the state")
    // dims/measures changing mid-stream must fail fast, not misread
    val e = intercept[IllegalArgumentException] {
      StreamingUpsert.summaryStateBatch(spark, mk(1000, 1100), "k",
        Seq("g"), Seq("x", "k"), 3L, base)
    }
    assert(e.getMessage.contains("must not change mid-stream"))
  }

  test("quantileStateBatch: state bit-equals the one-shot sketch; re-delivery absorbed without a gate; replay idempotent") {
    import graft.ops.Sketches
    val base = tmp("qs_state")
    val dims = Seq("g")
    def mk(lo: Long, hi: Long) =
      spark.range(lo, hi).select(
        $"id".cast("string").as("k"),
        ($"id" % 4).cast("string").as("g"),
        ($"id" % 997).cast("double").as("x"))
    def feed(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingUpsert.quantileStateBatch(spark, df, dims, "k", "x",
        128, id, base)
    feed(mk(0, 400), 0L)
    // batch 1 re-delivers half of batch 0: NO seen gate exists — the
    // content-identified sketch rows must absorb it via distinct
    feed(mk(400, 700).unionByName(mk(0, 200)), 1L)
    feed(mk(700, 1000), 2L)
    val oneShot = Sketches.quantilePartials(mk(0, 1000), dims,
      col("k"), col("x"), 128)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    assert(snap(StreamingUpsert.quantileFromState(spark, base))
      .sameElements(snap(oneShot)),
      "streamed sketch != one-shot sketch of the union")
    // same-batch replay reproduces the version exactly
    feed(mk(700, 1000), 2L)
    assert(snap(StreamingUpsert.quantileFromState(spark, base))
      .sameElements(snap(oneShot)),
      "replay of the last batch changed the state")
    // key/value/dims changing mid-stream must fail fast
    val e = intercept[IllegalArgumentException] {
      StreamingUpsert.quantileStateBatch(spark, mk(1000, 1100),
        Seq("g", "k"), "k", "x", 128, 3L, base)
    }
    assert(e.getMessage.contains("must not change mid-stream"))
  }

  test("dhashNearDupBatch over sliced image batches equals batch hammingPairs; replay absorbed; fail-closed") {
    import graft.ops.{Dedup, Media}
    // 4 pattern groups x 2 copies (copy = +16 brightness shift, dHash-
    // identical) + 2 undecodable text blobs
    def pat(i: Long)(x: Int, y: Int): (Int, Int, Int) =
      (8 + ((x * (2 + i) + y * (3 + 2 * i)) * 7).toInt % 180,
        8 + ((x * (5 + i) + y * (1 + i)) * 11).toInt % 180,
        8 + ((x + y * (2 + i)) * 13).toInt % 180)
    val blobs = (0L until 4L).flatMap { i =>
      Seq((i * 10, Media.pngFixture(18, 16)(pat(i))),
        (i * 10 + 1, Media.pngFixture(18, 16) { (x, y) =>
          val (r, g, b) = pat(i)(x, y); (r + 16, g + 16, b + 16)
        }))
    } ++ Seq((90L, "nope".getBytes("UTF-8")),
      (91L, "also nope".getBytes("UTF-8")))
    val df = blobs.toDF("doc_id", "bin")
    val want = Dedup.hammingPairs(
        graft.ops.Media.dhashImages(df, "doc_id", "bin")
          .filter($"ok")
          .select($"id".as("doc_id"), $"dhash".as("fp")),
        maxDist = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture must produce pairs")
    for (slices <- Seq(Seq(Seq(0L, 1L, 90L), Seq(10L, 11L, 21L), Seq(20L, 30L, 31L, 91L)),
                       Seq(Seq(31L, 1L), Seq(11L, 21L, 0L, 91L), Seq(10L, 20L, 30L, 90L)))) {
      val base = tmp("dhash_state")
      slices.foreach { ids =>
        StreamingUpsert.dhashNearDupBatch(spark,
          df.filter($"doc_id".isin(ids: _*)), "doc_id", "bin",
          maxDist = 6, basePath = base)
      }
      // replay the LAST batch — anti-join guard + distinct-at-read
      StreamingUpsert.dhashNearDupBatch(spark,
        df.filter($"doc_id".isin(slices.last: _*)), "doc_id", "bin",
        maxDist = 6, basePath = base)
      val got = StreamingUpsert.dhashPairsFromState(spark, base)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want, s"slicing $slices diverged from batch pairs")
    }
  }

  test("hammingNearDupBatch over sliced AUDIO batches equals batch hammingPairs; replay absorbed") {
    import graft.ops.{Dedup, Media}
    // the fingerprint-agnostic protocol on the audio modality: 3 clip
    // groups x 2 copies (copy = exact half-gain, hash-identical) + a
    // non-WAV blob that fails the fingerprint contract closed
    def samples(seed: Int): Seq[Int] =
      (0 until 130).map { t =>
        2 * ((((t.toLong * (7 + 3 * seed) * 2029L + (seed + 1) * 991L +
          t.toLong * t * (11 + seed)) % 3001L).toInt) - 1500)
      }
    val blobs = (0 until 3).flatMap { i =>
      Seq((i * 10L, Media.encodeWavPcm16(samples(i))),
        (i * 10L + 1, Media.encodeWavPcm16(samples(i).map(_ / 2))))
    } :+ ((90L, "not a wav".getBytes("UTF-8")))
    val df = blobs.toDF("doc_id", "bin")
    def fps(d: org.apache.spark.sql.DataFrame) =
      Media.energyHashWav(d, "doc_id", "bin")
        .filter($"ok").select($"id".as("doc_id"), $"fp")
    val want = Dedup.hammingPairs(fps(df), maxDist = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(want === Set((0L, 1L, 0L), (10L, 11L, 0L), (20L, 21L, 0L)),
      "each gain pair at distance 0, nothing across groups")
    val base = tmp("audio_hamming_state")
    val slices = Seq(Seq(0L, 11L, 90L), Seq(1L, 10L), Seq(20L, 21L))
    slices.foreach { ids =>
      StreamingUpsert.hammingNearDupBatch(spark,
        fps(df.filter($"doc_id".isin(ids: _*))), maxDist = 6,
        basePath = base)
    }
    // replay the middle batch — anti-join guard + distinct-at-read
    StreamingUpsert.hammingNearDupBatch(spark,
      fps(df.filter($"doc_id".isin(slices(1): _*))), maxDist = 6,
      basePath = base)
    val got = StreamingUpsert.dhashPairsFromState(spark, base)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want, "sliced audio state diverged from batch pairs")
  }

  test("setJaccardBatch over sliced set batches equals batch setJaccardPairs; replay absorbed") {
    import graft.ops.Dedup
    // synthetic frame-hash sets (the protocol is set-level — no codec
    // needed): two near-dup groups, one disjoint clip, one empty set
    val sets = Seq(
      (1L, Seq("f1", "f2", "f3", "f4")),
      (2L, Seq("f1", "f2", "f3", "f9")),   // 3/5 vs 1
      (3L, Seq("f1", "f2", "f3", "f4")),   // exact copy of 1
      (10L, Seq("g1", "g2")),
      (11L, Seq("g1", "g2")),
      (20L, Seq("z1", "z2", "z3")),
      (30L, Seq.empty[String])).toDF("doc_id", "shs")
    val want = Dedup.setJaccardPairs(sets, tauPpm = 500000L, maxDf = 10L)
      .select($"doc_a", $"doc_b", $"jac_ppm")
      .as[(Long, Long, Long)].collect().toSet
    assert(want === Set((1L, 2L, 600000L), (1L, 3L, 1000000L),
      (2L, 3L, 600000L), (10L, 11L, 1000000L)))
    val base = tmp("setjac_state")
    def feed(ids: Seq[Long]): Unit =
      StreamingUpsert.setJaccardBatch(spark,
        sets.filter($"doc_id".isin(ids: _*)), tauPpm = 500000L,
        maxDf = 10L, basePath = base)
    feed(Seq(1L, 10L, 30L))
    feed(Seq(2L, 11L))
    feed(Seq(3L, 20L))
    // replay the middle batch — anti-join guard + distinct-at-read
    feed(Seq(2L, 11L))
    val got = StreamingUpsert.setJaccardPairsFromState(spark, base)
      .select($"doc_a", $"doc_b", $"jac_ppm")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want, "sliced set state diverged from batch pairs")
  }

  test("set-state df ASSET: totals equal the inv recount under replay; partials batch-bounded; cap crossing keeps pre-cap pairs") {
    import graft.ops.Dedup
    // docs 3/4/5 are exact "hot"-only copies (jaccard 1.0 — only the
    // df cap can block them), so cap crossing is behaviorally visible
    val sets = Seq(
      (1L, Seq("hot", "a1")), (2L, Seq("hot", "a1")),
      (3L, Seq("hot")), (4L, Seq("hot")),
      (5L, Seq("hot")), (20L, Seq("z1", "z2"))).toDF("doc_id", "shs")
    val base = tmp("setjac_df_state")
    def feed(ids: Seq[Long]): Unit =
      StreamingUpsert.setJaccardBatch(spark,
        sets.filter($"doc_id".isin(ids: _*)), tauPpm = 400000L,
        maxDf = 3L, basePath = base)
    feed(Seq(1L, 2L, 20L))   // "hot" df=2: 1-2 pair found under cap
    feed(Seq(3L, 4L))        // "hot" df=4: crosses maxDf=3
    feed(Seq(3L, 4L))        // replay — must not inflate df totals
    feed(Seq(5L))
    // df asset == inv recount per shingle, replay absorbed
    val fromAsset = StreamingUpsert.setStateDfTotals(spark, base)
      .as[(String, Long)].collect().toMap
    val recount = spark.read.parquet(s"$base/inv").distinct()
      .groupBy($"sh")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(fromAsset === recount, "df asset diverged from inv recount")
    assert(fromAsset("hot") === 5L, "replayed batch inflated the df total")
    // partials are batch-bounded: <= one row per (batch, shingle)
    val parts = spark.read.parquet(s"$base/df").distinct().count()
    assert(parts <= 4L * recount.size, s"df partials not batch-bounded: $parts")
    // arrival-time cap semantics survive the asset swap: the pair
    // found while "hot" was under cap stays; no post-cap "hot" pairs
    val got = StreamingUpsert.setJaccardPairsFromState(spark, base)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)),
      s"cap-crossing pairs diverged from arrival-time contract: $got")
  }

  test("setJaccardBatchCompacted: mid-stream compaction + delta equals batch pairs; replay overwrites idempotently") {
    import graft.ops.Dedup
    val sets = Seq(
      (1L, Seq("f1", "f2", "f3", "f4")),
      (2L, Seq("f1", "f2", "f3", "f9")),
      (3L, Seq("f1", "f2", "f3", "f4")),
      (10L, Seq("g1", "g2")),
      (11L, Seq("g1", "g2")),
      (20L, Seq("z1", "z2", "z3"))).toDF("doc_id", "shs")
    val want = Dedup.setJaccardPairs(sets, tauPpm = 500000L, maxDf = 10L)
      .select($"doc_a", $"doc_b", $"jac_ppm")
      .as[(Long, Long, Long)].collect().toSet
    val base = tmp("setjac_compacted")
    val (setsT, invT) = ("sjc_sets_spec", "sjc_inv_spec")
    spark.sql(s"DROP TABLE IF EXISTS $setsT")
    spark.sql(s"DROP TABLE IF EXISTS $invT")
    def feed(ids: Seq[Long], id: Long): Unit =
      StreamingUpsert.setJaccardBatchCompacted(spark,
        sets.filter($"doc_id".isin(ids: _*)), tauPpm = 500000L,
        maxDf = 10L, basePath = base, setsTable = setsT,
        invTable = invT, batchId = id)
    feed(Seq(1L, 10L), 0L)
    // batch 1 re-delivers doc 1 (cross-batch — the seen gate drops it)
    feed(Seq(2L, 11L, 1L), 1L)
    StreamingUpsert.compactSetState(spark, base, setsT, invT)
    feed(Seq(3L, 20L), 2L)   // uncompacted delta vs the bucketed tables
    feed(Seq(3L, 20L), 2L)   // replayed last batch — overwrite, no dupes
    val got = StreamingUpsert.setJaccardPairsFromCompactedState(spark, base)
      .select($"doc_a", $"doc_b", $"jac_ppm")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want, "compacted set state diverged from batch pairs")
    spark.sql(s"DROP TABLE IF EXISTS $setsT")
    spark.sql(s"DROP TABLE IF EXISTS $invT")
  }

  test("decontaminationBatch: sliced train equals batch contaminationPairs; re-delivery + replay absorbed; df chain only") {
    import graft.ops.{Decontaminate, Dedup}
    val trainDf = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different words entirely unrelated content here"),
      (4L, "yet more other material nothing shared with anything"),
      (5L, "short text")).toDF("doc_id", "text")
    val testDf = Seq(
      (101L, "the quick brown fox jumps over the lazy dog today"),
      (102L, "fox jumps over the lazy"),
      (103L, "never seen anywhere zq1 zq2 zq3 zq4 zq5"))
      .toDF("test_id", "text")
    val want = Decontaminate.contaminationPairs(trainDf, "doc_id", "text",
        testDf, "test_id", "text", n = 3, tauPpm = 800000L, maxDf = 100L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    val testSets = Dedup.shingleSets(testDf, "test_id", "text", 3)
      .select($"doc_id".as("test_id"), $"shs")
    val base = tmp("decont_state")
    def feed(ids: Seq[Long], id: Long): Unit =
      StreamingUpsert.decontaminationBatch(spark,
        trainDf.filter($"doc_id".isin(ids: _*)), "doc_id", "text",
        testSets, n = 3, tauPpm = 800000L, maxDf = 100L,
        basePath = base, batchId = id)
    feed(Seq(1L, 3L), 0L)
    feed(Seq(2L, 4L, 1L), 1L) // re-delivers doc 1 — seen gate drops it
    feed(Seq(5L), 2L)
    feed(Seq(5L), 2L)         // replayed last batch
    val got = StreamingUpsert.decontaminationPairsFromState(spark, base)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want, "maintained decontamination diverged from batch")
    // the ONLY retained train-side state is the df chain + seen gate
    // + found pairs — no sets/, no inv/
    assert(!new java.io.File(s"$base/sets").exists())
    assert(!new java.io.File(s"$base/inv").exists())
    // df chain = train-side counts, re-delivery not double-counted
    val hot = spark.read.parquet(
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$base/dfstats"))
          .iterator().next().toString)
      .filter($"sh" === "the quick brown").select($"df")
      .as[Long].collect()
    assert(hot.toSeq === Seq(2L), s"df chain wrong: ${hot.toSeq}")
  }

  test("multimodalNearDupBatch: sliced mixed batches equal the batch capstone; unknown fails closed; replay absorbed") {
    import graft.ops.{CleanCorpus, Media}
    def pat(i: Int)(x: Int, y: Int): (Int, Int, Int) =
      (8 + ((x * (2 + i) + y * (3 + 2 * i)) * 7) % 180,
        8 + ((x * (5 + i) + y * (1 + i)) * 11) % 180,
        8 + ((x + y * (2 + i)) * 13) % 180)
    val junk = Array[Byte](0xFE.toByte, 0x01, 0xC3.toByte, 0x28, 0x77)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today".getBytes("UTF-8")),
      (2L, "the quick brown fox jumps over the lazy dog today".getBytes("UTF-8")),
      (3L, "completely different words entirely unrelated content".getBytes("UTF-8")),
      (10L, Media.pngFixture(18, 16)(pat(0))),
      (11L, Media.pngFixture(18, 16) { (x, y) =>
        val (r, g, b) = pat(0)(x, y); (r + 16, g + 16, b + 16) }),
      (12L, Media.pngFixture(18, 16)(pat(3))),
      (50L, junk), (51L, junk)).toDF("doc_id", "bin")
    val want = CleanCorpus.multimodalNearDupClusters(corpus)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(want === Set((1L, 1L, true), (2L, 1L, false),
      (10L, 10L, true), (11L, 10L, false)),
      "batch capstone: text + image pairs only, junk fails closed")
    val base = tmp("mm_state")
    def feed(ids: Seq[Long], id: Long): Unit =
      StreamingUpsert.multimodalNearDupBatch(spark,
        corpus.filter($"doc_id".isin(ids: _*)), base, id)
    feed(Seq(1L, 11L, 50L), 0L)
    feed(Seq(2L, 10L, 51L, 1L), 1L) // re-delivers doc 1
    feed(Seq(3L, 12L), 2L)
    feed(Seq(3L, 12L), 2L)          // replayed last batch
    val got = StreamingUpsert.multimodalClustersFromState(spark, base)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === want, "maintained capstone diverged from batch")
  }

  test("topKStateBatch: state equals one-shot topKPerKey; re-delivery absorbed; replay idempotent; eviction permanent") {
    import graft.ops.TopK
    val base = tmp("topk_state")
    def mk(lo: Long, hi: Long) =
      spark.range(lo, hi).select(
        ($"id" % 5).as("g"), ($"id" * 37 % 101).as("ord"), $"id".as("rid"))
    def feed(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingUpsert.topKStateBatch(spark, df, Seq("g"), "ord", "rid",
        3, id, base)
    feed(mk(0, 40), 0L)
    // batch 1 re-delivers half of batch 0, INCLUDING rows that were
    // top-k at version 0 (the duplicate-eviction hazard: without the
    // distinct, a re-delivered leader evicts a genuine runner-up) and
    // rows already evicted (dominated — must stay out)
    feed(mk(40, 70).unionByName(mk(0, 20)), 1L)
    feed(mk(70, 100), 2L)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    val oneShot = TopK.topKPerKey(mk(0, 100), Seq("g"), "ord", "rid", 3)
    def served = StreamingUpsert.topKFromState(spark, base,
      Seq("g"), "ord", "rid", 3)
    assert(snap(served).sameElements(snap(oneShot)),
      "streamed top-k != one-shot aggregate of the union")
    // same-batch replay reproduces the version exactly
    feed(mk(70, 100), 2L)
    assert(snap(served).sameElements(snap(oneShot)),
      "replay of the last batch changed the state")
    // schema drift fails fast
    val e = intercept[IllegalArgumentException] {
      StreamingUpsert.topKStateBatch(spark,
        mk(100, 110).withColumnRenamed("ord", "ord2"),
        Seq("g"), "ord2", "rid", 3, 3L, base)
    }
    assert(e.getMessage.contains("must not change mid-stream"))
  }

  test("clusterStateBatch over shuffled pair batches equals batch duplicateClusters (property)") {
    val rnd = new scala.util.Random(19112L)
    for (trial <- 0 until 3) {
      val n = 40
      val edges = (0 until 60).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val base = tmp(s"cluster_state_$trial")
      val slices = rnd.shuffle(edges).grouped(edges.size / 3 + 1).toSeq
      slices.zipWithIndex.foreach { case (sl, i) =>
        StreamingUpsert.clusterStateBatch(spark,
          sl.toDF("doc_a", "doc_b"), base, i.toLong)
      }
      val got = StreamingUpsert.clustersFromState(spark, base)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      val want = Dedup.duplicateClusters(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(got === want, s"trial $trial slices=${slices.size}")
    }
  }

  test("deferred cluster fold equals the per-batch fold sequence (property)") {
    val rnd = new scala.util.Random(20817L)
    for (trial <- 0 until 3) {
      val n = 40
      val edges = (0 until 60).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val base = tmp(s"fold_deferred_$trial")
      val slices = rnd.shuffle(edges).grouped(edges.size / 3 + 1).toSeq
      // per-batch mode: fold the CURRENT pair union every batch
      // (q269's r16 choreography)
      var union = Seq.empty[(Long, Long)]
      slices.zipWithIndex.foreach { case (sl, i) =>
        union = union ++ sl
        StreamingUpsert.clusterStateBatch(spark,
          union.toDF("doc_a", "doc_b").distinct(), s"$base/per", i.toLong)
      }
      // deferred mode: accumulate deltas, fold ONCE before serve —
      // here through the nearDupBatch-shaped pairs layout
      union.toDF("doc_a", "doc_b").write.mode("overwrite")
        .parquet(s"$base/acc/pairs")
      StreamingUpsert.clusterFoldFromPairs(spark, s"$base/acc",
        s"$base/def", 0L)
      def snap(p: String) = StreamingUpsert.clustersFromState(spark, p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(snap(s"$base/def") === snap(s"$base/per"),
        s"trial $trial: deferred fold diverged from per-batch folds")
    }
  }

  test("clusterStateBatch replay of the last batch rebuilds identical state") {
    val base = tmp("cluster_state_replay")
    StreamingUpsert.clusterStateBatch(spark,
      Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b"), base, 0L)
    StreamingUpsert.clusterStateBatch(spark,
      Seq((2L, 3L)).toDF("doc_a", "doc_b"), base, 1L)
    val before = StreamingUpsert.clustersFromState(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // foreachBatch failure semantics: the LAST batch is re-delivered
    StreamingUpsert.clusterStateBatch(spark,
      Seq((2L, 3L)).toDF("doc_a", "doc_b"), base, 1L)
    val after = StreamingUpsert.clustersFromState(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before)
    assert(after === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("lmCountsBatch: streamed counts equal one-shot; re-delivery + replay absorbed") {
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cat ran"),
      (3L, "a dog sat"), (4L, "the cat sat again"),
      (5L, "a cat and a dog"), (6L, "dog ran far")).toDF("doc_id", "text")
    val base = tmp("lm_state") + "/s"
    def feed(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingUpsert.lmCountsBatch(spark, df, "doc_id", "text", base, id)
    feed(docs.filter($"doc_id" <= 2L), 0L)
    // batch 1 re-delivers doc 1 — the seen gate must not double-count
    feed(docs.filter($"doc_id".between(3L, 4L))
      .unionByName(docs.filter($"doc_id" === 1L)), 1L)
    feed(docs.filter($"doc_id" >= 5L), 2L)
    feed(docs.filter($"doc_id" >= 5L), 2L) // replayed last batch
    val (uni, model) = StreamingUpsert.lmModelFromState(spark, base)
    assert(uni.as[(String, Long)].collect().toSet ===
      graft.ops.LangModel.unigramCounts(docs, "text")
        .as[(String, Long)].collect().toSet)
    assert(model.as[(String, String, Long, Long)].collect().toSet ===
      graft.ops.LangModel.bigramModel(docs, "text")
        .as[(String, String, Long, Long)].collect().toSet)
  }

  test("clfCountsBatch: streamed counts equal one-shot; re-delivery + replay absorbed") {
    val docs = Seq(
      (1L, "clean", "the cat sat"), (2L, "spam", "buy cat buy"),
      (3L, "clean", "a dog sat"), (4L, "spam", "free dog click"),
      (5L, "clean", "the cat ran"), (6L, "spam", "click buy free"))
      .toDF("doc_id", "label", "text")
    val base = tmp("clf_state") + "/s"
    def feed(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingUpsert.clfCountsBatch(spark, df, "doc_id", "label",
        "text", base, id)
    feed(docs.filter($"doc_id" <= 2L), 0L)
    // batch 1 re-delivers doc 1 — the seen gate must not double-count
    feed(docs.filter($"doc_id".between(3L, 4L))
      .unionByName(docs.filter($"doc_id" === 1L)), 1L)
    feed(docs.filter($"doc_id" >= 5L), 2L)
    feed(docs.filter($"doc_id" >= 5L), 2L) // replayed last batch
    val (w, r) = StreamingUpsert.clfModelFromState(spark, base)
    val counts = graft.ops.Classify.classTokenCounts(docs, "label", "text")
    assert(w.as[(String, String, Long)].collect().toSet ===
      graft.ops.Classify.tokenWeights(counts)
        .as[(String, String, Long)].collect().toSet)
    assert(r.as[(String, Long)].collect().toSet ===
      graft.ops.Classify.baseRates(counts)
        .as[(String, Long)].collect().toSet)
  }

  test("lmTrigramCountsBatch: streamed counts equal one-shot; re-delivery + replay absorbed") {
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cat ran"),
      (3L, "a dog sat"), (4L, "the cat sat again"),
      (5L, "a cat and a dog"), (6L, "dog ran far")).toDF("doc_id", "text")
    val base = tmp("lm3_state") + "/s"
    def feed(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingUpsert.lmTrigramCountsBatch(spark, df, "doc_id", "text",
        base, id)
    feed(docs.filter($"doc_id" <= 2L), 0L)
    feed(docs.filter($"doc_id".between(3L, 4L))
      .unionByName(docs.filter($"doc_id" === 1L)), 1L) // re-delivery
    feed(docs.filter($"doc_id" >= 5L), 2L)
    feed(docs.filter($"doc_id" >= 5L), 2L) // replayed last batch
    val (uni, bi, tri) = StreamingUpsert.lmTrigramModelFromState(spark, base)
    assert(uni.as[(String, Long)].collect().toSet ===
      graft.ops.LangModel.unigramCounts(docs, "text")
        .as[(String, Long)].collect().toSet)
    assert(bi.as[(String, String, Long, Long)].collect().toSet ===
      graft.ops.LangModel.bigramModel(docs, "text")
        .as[(String, String, Long, Long)].collect().toSet)
    assert(tri.as[(String, String, String, Long, Long)].collect().toSet ===
      graft.ops.LangModel.trigramModel(docs, "text")
        .as[(String, String, String, Long, Long)].collect().toSet)
  }

  test("lmModelFromState serves the min COMMON version after a torn write") {
    val docs = Seq((1L, "x y x"), (2L, "y z")).toDF("doc_id", "text")
    val base = tmp("lm_state_torn") + "/s"
    StreamingUpsert.lmCountsBatch(spark, docs.filter($"doc_id" === 1L),
      "doc_id", "text", base, 0L)
    StreamingUpsert.lmCountsBatch(spark, docs.filter($"doc_id" === 2L),
      "doc_id", "text", base, 1L)
    // simulate a crash between the uni and bi writes of batch 1: bi's
    // v=1 is lost; pruning kept v=0 as the predecessor of both
    val p = new org.apache.hadoop.fs.Path(s"$base/bi/v=1")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    val (uni, model) = StreamingUpsert.lmModelFromState(spark, base)
    // both faces come from v=0 — the single-doc model, not a mix
    assert(uni.as[(String, Long)].collect().toSet ===
      graft.ops.LangModel.unigramCounts(
        docs.filter($"doc_id" === 1L), "text")
        .as[(String, Long)].collect().toSet)
    assert(model.as[(String, String, Long, Long)].collect().toSet ===
      graft.ops.LangModel.bigramModel(
        docs.filter($"doc_id" === 1L), "text")
        .as[(String, String, Long, Long)].collect().toSet)
  }
}
