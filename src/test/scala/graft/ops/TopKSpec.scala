package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame,
                         k: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy($"key").orderBy($"ord".desc, $"id".asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"key", $"rank", $"id", $"ord")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select($"key", $"rank", $"id", $"ord")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  test("topKPerKey == window row_number form under heavy ties (property)") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 5) {
      val n = 200 + trial * 70
      // ord drawn from a tiny domain to force ties at every boundary;
      // ids distinct so the (ord DESC, id ASC) order is total
      val rows = (0 until n).map { i =>
        (rnd.nextInt(7).toLong, rnd.nextInt(4).toLong, i.toLong)
      }
      val df = rows.toDF("key", "ord", "id").repartition(5)
      val k = 1 + rnd.nextInt(4)
      assert(asSet(TopK.topKPerKey(df, Seq("key"), "ord", "id", k)) ===
        asSet(windowForm(df, k)), s"trial $trial k=$k")
    }
  }

  test("serveTopK over partials == batch top-k under ANY segmentation (property)") {
    val rnd = new scala.util.Random(9918821L)
    for (trial <- 0 until 5) {
      val n = 300
      val rows = (0 until n).map { i =>
        // seg simulates the ingest day the partial was built for
        (rnd.nextInt(8).toLong, rnd.nextInt(6).toLong,
          rnd.nextInt(5).toLong, i.toLong)
      }
      val df = rows.toDF("seg", "key", "ord", "id").repartition(5)
      val k = 1 + rnd.nextInt(4)
      val partials = TopK.topKPartials(df, "seg", Seq("key"), "ord", "id", k)
      // partial rows are segment x key sized, each array k-bounded
      assert(partials.count() <= 8L * 6L)
      val served = TopK.serveTopK(partials, Seq("key"), "ord", "id", k)
      assert(asSet(served) === asSet(windowForm(df, k)),
        s"trial $trial k=$k")
    }
  }

  test("topKPerKey: groups smaller than k kept whole; null ord/id dropped") {
    val df = Seq(
      (1L, Some(10L), Some(100L)), (1L, Some(20L), Some(101L)),
      (2L, Some(5L), Some(200L)),
      (3L, None, Some(300L)), (3L, Some(7L), None)
    ).toDF("key", "ord", "id")
    val got = TopK.topKPerKey(df, Seq("key"), "ord", "id", 3)
      .orderBy($"key", $"rank").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 1L, 2L))
    // best-first: ord 20 ranks 1
    assert(got(0).getAs[Long]("ord") === 20L)
    assert(got(0).getAs[Long]("rank") === 1L)
    assert(got(1).getAs[Long]("ord") === 10L)
  }

  test("topKPerKey plans as partial ObjectHashAggregate BELOW the exchange") {
    // the partial-aggregation bound: map-side truncation to k rows per
    // key per task — a regression toward final-only aggregation would
    // shuffle the corpus
    val df = (0 until 1000).map(i => (i % 10L, i.toLong, i.toLong))
      .toDF("key", "ord", "id")
    val p = TopK.topKPerKey(df, Seq("key"), "ord", "id", 3)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("ObjectHashAggregate"), p)
    val ex = p.indexOf("Exchange")
    val partial = p.indexOf("partial_")
    assert(ex >= 0 && partial > ex,
      s"partial topK aggregate must sit below the exchange:\n$p")
  }

  test("ad-hoc window top-k already truncates map-side (InferWindowGroupLimit) — pinned") {
    // The reason topKPerKey is NOT pitched as the ad-hoc form: Spark
    // 3.5+ plans `row_number() <= k` as a partial WindowGroupLimit
    // below the exchange, so the idiomatic window query ships <= k
    // rows per key per task on its own. Pin that plan shape — if a
    // regression (or a filter rewrite) breaks the inference, the
    // window form silently reverts to shuffling the corpus.
    val df = (0 until 1000).map(i => (i % 10L, i.toLong, i.toLong))
      .toDF("key", "ord", "id")
    val p = windowForm(df, 3).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("WindowGroupLimit"), p)
    val ex = p.indexOf("Exchange")
    val partial = p.indexOf("WindowGroupLimit", ex.max(0))
    assert(ex >= 0 && partial > ex,
      s"partial WindowGroupLimit must sit below the exchange:\n$p")
  }

  test("shuffle volume: aggregator and limited window are k-bounded; unlimited window pays the corpus") {
    // deterministic record-count measurement (not timing): 4
    // partitions x 10 keys x k=3 -> the two bounded forms write O(120)
    // shuffle records; ranking WITHOUT the k filter must shuffle all
    // 20k rows. Counted via task-end shuffle-write metrics.
    val sc = spark.sparkContext
    val df = (0 until 20000).map(i => (i % 10L, i.toLong, i.toLong))
      .toDF("key", "ord", "id").repartition(4)
      .localCheckpoint() // isolate the measured jobs from the fixture build
    def shuffleRecords(action: => Unit): Long = {
      val acc = sc.longAccumulator("shufrec")
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            acc.add(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      sc.addSparkListener(l)
      try {
        action
        // the listener bus is async; poll until the accumulator stops
        // moving (the DedupSpec stableMaxJobId discipline)
        var prev = -1L; var same = 0
        while (same < 3) {
          Thread.sleep(100)
          val c = acc.value
          if (c == prev) same += 1 else { same = 0; prev = c }
        }
        acc.value
      } finally sc.removeSparkListener(l)
    }
    val topk = shuffleRecords {
      TopK.topKPerKey(df, Seq("key"), "ord", "id", 3).count()
    }
    val winLimited = shuffleRecords { windowForm(df, 3).count() }
    val winUnlimited = shuffleRecords {
      val w = Window.partitionBy($"key").orderBy($"ord".desc, $"id".asc)
      // aggregate OVER the rank so column pruning can't drop the window
      df.withColumn("rank", row_number().over(w))
        .agg(sum($"rank")).collect()
    }
    // 120 partial rows + a handful of partial-count rows from count()
    assert(topk <= 200L, s"aggregator partials must cap the shuffle: $topk")
    assert(winLimited <= 200L,
      s"WindowGroupLimit must cap the window shuffle: $winLimited")
    assert(winUnlimited >= 20000L,
      s"unlimited ranking is the corpus-shuffle contrast: $winUnlimited")
  }
}
