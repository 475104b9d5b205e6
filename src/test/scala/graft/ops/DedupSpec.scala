package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val dupText = "alpha beta gamma delta epsilon zeta eta theta"

  test("exactGroups: one group per distinct content, counts and keeper") {
    val df = Seq((1L, "aa"), (2L, "aa"), (3L, "bb")).toDF("id", "text")
    val g = Dedup.exactGroups(df, "id", "text")
      .orderBy("keeper_id").collect()
    assert(g.length === 2)
    assert(g(0).getAs[Long]("keeper_id") === 1L)
    assert(g(0).getAs[Long]("n_copies") === 2L)
    assert(g(1).getAs[Long]("n_copies") === 1L)
  }

  test("dropRepeatedSpans: shared block survives only at first occurrence") {
    // 4-token blocks: doc 1 = X ++ A, doc 2 = X ++ B, doc 3 == doc 1.
    // Block X repeats 3x -> kept only in doc 1; block A repeats 2x
    // (docs 1 and 3) -> kept only in doc 1; doc 3 loses everything.
    val x = "one two three four"
    val a = "alpha beta gamma delta"
    val b = "red green blue yellow"
    val df = Seq((1L, s"$x $a"), (2L, s"$x $b"), (3L, s"$x $a"))
      .toDF("doc_id", "text")
    val got = Dedup.dropRepeatedSpans(df, "doc_id", "text",
        spanTokens = 4, minRepeat = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 2L, s"$x $a"), // first occurrence keeps both blocks
      (2L, 2L, 1L, b),        // shared header X removed, unique tail kept
      (3L, 2L, 0L, "")))      // full duplicate vanishes
    // partial trailing blocks participate: a doc shorter than one span
    // is its own single block
    val short = Seq((7L, "lone tail"), (8L, "lone tail")).toDF("doc_id", "text")
    val g2 = Dedup.dropRepeatedSpans(short, "doc_id", "text", 4, 2L)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(g2 === Seq((7L, 1L, 1L, "lone tail"), (8L, 1L, 0L, "")))
  }

  test("dropRepeatedSpans enforces its id-encoding contract (ADVICE r4)") {
    // doc_id >= 2^43 would collide with another doc's keeper key under
    // the doc_id*1e6+pos encoding — the guard must raise, not corrupt
    val bad = Seq(((1L << 43) + 5L, "one two three four"),
      (2L, "one two three four")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.dropRepeatedSpans(bad, "doc_id", "text", 4, 2L).collect()
    }
    def rootMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" ")
    assert(rootMsg(e).contains("dropRepeatedSpans contract violated"))
    // negative ids equally rejected
    val neg = Seq((-1L, "one two three four")).toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      Dedup.dropRepeatedSpans(neg, "doc_id", "text", 4, 2L).collect()
    }
    assert(rootMsg(e2).contains("dropRepeatedSpans contract violated"))
  }

  test("lastWriteWins keeps the newest row per key; ties broken by id desc") {
    val df = Seq(
      ("k1", 1L, "old"), ("k1", 5L, "new"),
      ("k2", 3L, "a"), ("k2", 3L, "b")).toDF("k", "v", "payload")
    val got = Dedup.lastWriteWins(df, "k", "v", "payload")
      .orderBy("k").select("payload").as[String].collect().toSeq
    assert(got === Seq("new", "b")) // k2 tie on v=3 -> payload desc
  }

  test("aggregate LWW == window LWW on randomized data (property)") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(400) { i =>
      (s"k${rnd.nextInt(40)}", rnd.nextInt(20).toLong, s"p$i")
    }
    val df = rows.toDF("k", "v", "payload")
    val agg = Dedup.lastWriteWins(df, "k", "v", "payload")
    val win = Dedup.lastWriteWinsWindow(df, "k", "v", "payload")
    assert(agg.except(win).count() === 0L)
    assert(win.except(agg).count() === 0L)
    assert(agg.count() === df.select("k").distinct().count())
  }

  test("aggregate LWW and window LWW pick identical keepers (skew-immune form)") {
    val df = Seq(
      ("k1", 1L, "a"), ("k1", 9L, "b"), ("k1", 9L, "a"),
      ("k2", 2L, "x"), ("k3", 0L, "z")).toDF("k", "v", "payload")
    val agg = Dedup.lastWriteWins(df, "k", "v", "payload")
    val win = Dedup.lastWriteWinsWindow(df, "k", "v", "payload")
    assert(agg.schema.map(f => (f.name, f.dataType)) ===
      win.schema.map(f => (f.name, f.dataType))) // nullability may differ
    assert(agg.except(win).count() === 0L)
    assert(win.except(agg).count() === 0L)
  }

  test("ngramJaccardPairs: identical docs score 1.0, unrelated absent") {
    val df = Seq((1L, dupText), (2L, dupText),
      (3L, "totally unrelated words nothing shared at all ok"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.5).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Long]("doc_a") === 1L)
    assert(pairs.head.getAs[Long]("doc_b") === 2L)
    assert(pairs.head.getAs[Double]("jaccard") === 1.0)
  }

  test("ngramJaccardPairs df cap drops hot-shingle-only candidates") {
    // every doc shares the same 3-gram; maxDf=2 filters it from the index
    val hot = Seq.tabulate(5)(i => (i.toLong, s"common shared phrase unique$i"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(hot, "doc_id", "text", 3,
      tau = 0.0, maxDf = 1000L).count()
    val capped = Dedup.ngramJaccardPairs(hot, "doc_id", "text", 3,
      tau = 0.0, maxDf = 2L).count()
    assert(uncapped === 10L) // all C(5,2) pairs via the hot shingle
    assert(capped === 0L)
  }

  test("jaccardPairsExact equals brute force and keeps hot-shingle pairs (property)") {
    // Randomized corpus with heavy shingle sharing: the prefix-filtered
    // join must return EXACTLY the pairs a brute-force all-pairs
    // Jaccard finds — including pairs whose shared shingles are all
    // hot (the case the df-capped ngramJaccardPairs documents missing).
    val rnd = new scala.util.Random(123)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta")
    val docs = ((0 until 40).map(i => (i.toLong,
      Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))) :+
      (100L, "common shared phrase one") :+
      (101L, "common shared phrase"))
      .toDF("doc_id", "text")
    val tau = 0.4
    val exact = Dedup.jaccardPairsExact(docs, "doc_id", "text", 3, tau)
      .as[(Long, Long, Double)].collect().toSet
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .filter(size($"shs") > 0)
    val brute = sets.as("sa").crossJoin(sets.as("sb"))
      .filter(col("sa.doc_id") < col("sb.doc_id"))
      .select(col("sa.doc_id"), col("sb.doc_id"),
        (size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("double") /
          (size(col("sa.shs")) + size(col("sb.shs")) -
            size(array_intersect(col("sa.shs"), col("sb.shs")))).cast("double"))
          .as("j"))
      .filter($"j" >= tau)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact === brute)
    // the planted hot-shingle-only pair is present in the exact join
    // but absent from the df-capped one at a tight cap
    assert(exact.exists(p => p._1 === 100L && p._2 === 101L))
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3,
      tau, maxDf = 1L)
      .as[(Long, Long, Double)].collect().toSet
    assert(!capped.exists(p => p._1 === 100L && p._2 === 101L))
  }

  test("minhashLshPairs: near-identical docs survive banding and verify") {
    val df = Seq((1L, dupText), (2L, dupText + " iota"),
      (3L, "now for something completely different in every way indeed"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 2, tau = 0.5).collect()
    assert(pairs.length === 1)
    assert((pairs.head.getAs[Long]("doc_a"), pairs.head.getAs[Long]("doc_b"))
      === ((1L, 2L)))
    assert(pairs.head.getAs[Double]("jaccard") > 0.5)
  }

  test("minhashLshPairsFromTable == minhashLshPairs (persisted-asset path)") {
    val df = Seq((1L, dupText), (2L, dupText + " iota"),
      (3L, "now for something completely different in every way indeed"),
      (4L, dupText + " kappa"))
      .toDF("doc_id", "text")
    try {
      Dedup.writeLshAssets(df, "doc_id", "text", 3, 4, 2,
        "lsh_sets_t", "lsh_buckets_t", 4)
      val inline = Dedup.minhashLshPairs(df, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 2, tau = 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val fromTable = Dedup.minhashLshPairsFromTable(spark,
        "lsh_sets_t", "lsh_buckets_t", tau = 0.5)
        .as[(Long, Long, Double)].collect().toSet
      assert(fromTable === inline)
      assert(fromTable.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS lsh_sets_t")
      spark.sql("DROP TABLE IF EXISTS lsh_buckets_t")
    }
  }

  test("crossContamination finds cross-corpus shingle overlap, never within-corpus") {
    val train = Seq((1L, dupText), (2L, "no overlap here at all whatsoever"))
      .toDF("doc_id", "text")
    val bench = Seq((10L, dupText + " extra"), (11L, "unrelated benchmark content"))
      .toDF("doc_id", "text")
    val got = Dedup.crossContamination(train, "doc_id", "text",
      bench, "doc_id", "text", n = 3, maxDf = 100L, minShared = 3).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("left_id") === 1L)
    assert(got.head.getAs[Long]("right_id") === 10L)
    assert(got.head.getAs[Long]("n_shared") >= 3L)
  }

  test("duplicateClusters: connected components with min-id keeper") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(pairs)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (5L, 5L, true), (6L, 5L, false), (9L, 1L, false)))
  }

  test("duplicateClusters converges on a long chain (diameter > 2)") {
    val chain = (0L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(chain)
    assert(got.count() === 9L)
    assert(got.filter($"cluster_id" =!= 0L).count() === 0L)
    assert(got.filter($"is_keeper").count() === 1L)
  }

  test("minhashLshPairs maxBucket cap: boilerplate cohort cannot go quadratic") {
    // 300 identical docs land in ONE band bucket per band — without the
    // cap the candidate self-join is C(300,2) x 4 before verification.
    val docs = (0L until 300L).map(i => (i, dupText)).toDF("doc_id", "text")
    val capped = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 2, tau = 0.5, maxBucket = 50L)
    assert(capped.count() === 0L) // every bucket over cap -> no candidates
    // the audit surfaces exactly what the cap dropped
    val st = Dedup.lshBucketStats(docs, "doc_id", "text", 3, 4, 2, 50L).head()
    assert(st.getAs[Long]("n_buckets") === 4L)
    assert(st.getAs[Long]("n_dropped_buckets") === 4L)
    assert(st.getAs[Long]("n_docs_in_dropped") === 1200L) // 300 docs x 4 bands
    // identical content is the exactGroups case — the cheap path the cap
    // deliberately routes these to still finds every copy
    val g = Dedup.exactGroups(docs, "doc_id", "text").head()
    assert(g.getAs[Long]("n_copies") === 300L)
    // a genuine near-dup pair elsewhere in the corpus survives the cap
    val near = "rare unique sentence about voles swimming in the misty river"
    val mixed = docs.unionByName(
      Seq((1000L, near), (1001L, near + " tonight")).toDF("doc_id", "text"))
    val pairs = Dedup.minhashLshPairs(mixed, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 2, tau = 0.3, maxBucket = 50L).collect()
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 1000L &&
      r.getAs[Long]("doc_b") == 1001L))
    assert(pairs.forall(r => r.getAs[Long]("doc_a") >= 1000L))
  }

  test("simhashPairs maxBucket cap drops boilerplate cohorts") {
    val docs = (0L until 100L).map(i => (i, dupText)).toDF("doc_id", "text")
    assert(Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3,
      maxBucket = 10L).count() === 0L)
    // under the cap the pairs come back (3 docs -> 3 identical pairs)
    assert(Dedup.simhashPairs(docs.filter($"doc_id" < 3), "doc_id", "text",
      maxDist = 3).count() === 3L)
  }

  test("connectedComponents: 1000-edge path converges in ~log2(n) rounds") {
    // A near-dup CHAIN (boilerplate gradient) is the adversarial case
    // for min-label propagation: diameter 1000 => 1000 rounds there.
    val n = 1000
    val chain = (0L until n.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(chain)
    val bound = 2 * (math.log((n + 1).toDouble) / math.log(2.0)).ceil.toInt
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
    assert(labels.count() === (n + 1).toLong)
    assert(labels.filter($"lbl" =!= 0L).count() === 0L)
  }

  test("connectedComponents runs ONE action per round (convergence folded in)") {
    // With AQE off AND broadcast joins off, one action == one Spark
    // job, so job count measures ACTIONS exactly (AQE submits a job
    // per shuffle stage, broadcast exchanges submit collect jobs — in
    // either mode the count stops meaning anything). Expect: 1 eager
    // job for the input-edge barrier + 1 aggregate action per round —
    // the old isEmpty convergence probe would add a second action per
    // round.
    val chain = (0L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val tracker = spark.sparkContext.statusTracker
      // the status store is fed by the async listener bus — under a
      // full-suite run it can lag behind submitted jobs, so poll until
      // the HIGHEST job id stops moving before trusting a snapshot.
      // (Job ids, not counts: the store evicts old jobs past
      // spark.ui.retainedJobs, so a length delta can even go NEGATIVE
      // late in a suite run; max id is monotone and eviction-proof.)
      def stableMaxJobId(): Int = {
        def cur() = tracker.getJobIdsForGroup(null)
          .maxOption.getOrElse(-1)
        var prev = cur()
        var same = 0
        while (same < 3) {
          Thread.sleep(100)
          val c = cur()
          if (c == prev) same += 1 else { same = 0; prev = c }
        }
        prev
      }
      val before = stableMaxJobId()
      val (labels, rounds) = Dedup.connectedComponentsWithRounds(chain)
      val during = stableMaxJobId() - before
      assert(during <= rounds + 1, s"$during jobs for $rounds rounds")
      assert(during >= rounds)
      assert(labels.filter($"lbl" =!= 0L).count() === 0L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    }
  }

  test("simhashPairs: identical docs at distance 0; guards reject bad maxDist") {
    val df = Seq((1L, dupText), (2L, dupText),
      (3L, "argh blarg quux zork mumble frotz plugh xyzzy"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxDist = 3).collect()
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L && r.getAs[Long]("dist") == 0L))
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(df, "doc_id", "text", maxDist = 8)
    }
  }

  test("ccIncremental == batch CC on random graphs and random splits (property)") {
    val rnd = new scala.util.Random(12187L)
    for (trial <- 0 until 6) {
      val n = 30 + trial * 10
      val m = n + rnd.nextInt(n)
      val edges = (0 until m).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val cut = rnd.nextInt(edges.size + 1)
      val (base, delta) = edges.splitAt(cut)
      val all = edges.toDF("doc_a", "doc_b")
      val (want, _) = Dedup.connectedComponentsWithRounds(all)
      val (prev, _) = Dedup.connectedComponentsWithRounds(
        base.toDF("doc_a", "doc_b"))
      val got = Dedup.ccIncremental(prev, delta.toDF("doc_a", "doc_b"))
      val w = want.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val g = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(g === w, s"trial $trial cut=$cut/${edges.size}")
    }
  }

  test("ccIncremental: cross-component merge relabels wholesale; untouched pass through") {
    val base = Seq((1L, 2L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val (prev, _) = Dedup.connectedComponentsWithRounds(base)
    // 2-3 merges components {1,2} and {3,4}; 20-21 is brand-new;
    // {10,11} is untouched and must survive byte-identically
    val delta = Seq((2L, 3L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Dedup.ccIncremental(prev, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L), got)
    assert(got(10L) === 10L && got(11L) === 10L)
    assert(got(20L) === 20L && got(21L) === 20L)
    assert(got.size === 8)
  }

  test("ccIncremental: empty delta returns the prior labeling unchanged") {
    val base = Seq((5L, 6L), (6L, 7L)).toDF("doc_a", "doc_b")
    val (prev, _) = Dedup.connectedComponentsWithRounds(base)
    val got = Dedup.ccIncremental(prev,
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === prev.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("ccIncremental sub-problem is affected-sized: delta rounds don't scale with the graph") {
    // a 400-node corpus of 100 four-cliques (star depth 1 after CC),
    // delta touches ONE component — the incremental CC must converge
    // in a handful of rounds regardless of corpus-wide structure
    val base = (0 until 100).flatMap { c =>
      val b = c * 4L
      Seq((b, b + 1), (b, b + 2), (b, b + 3))
    }.toDF("doc_a", "doc_b")
    val (prev, _) = Dedup.connectedComponentsWithRounds(base)
    val delta = Seq((1L, 1000L)).toDF("doc_a", "doc_b")
    val got = Dedup.ccIncremental(prev, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1000L) === 0L)
    assert(got(399L) === 396L) // untouched clique keeps its root
    assert(got.size === 401)
  }

  test("containmentPairs: quoted-subset pair passes where Jaccard fails") {
    // doc 1 (8 tokens, 6 3-gram shingles) quoted whole inside doc 2's
    // 28 tokens (26 shingles): inter = 6 -> cont_a = 1.0, jaccard =
    // 6/26 ≈ 0.23; doc 3 unrelated
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val long = s"intro words go here $quote and then twelve more " +
      "trailing tokens pad the document out to a useful length"
    val docs = Seq((1L, quote), (2L, long),
      (3L, "completely different content nothing shared at all"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
        tauPpm = 900000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.size === 1)
    val (a, b, inter, na, nb, ca, cb) = got.head
    assert((a, b) === ((1L, 2L)))
    assert(inter === 6L && na === 6L)
    assert(ca === 1000000L)           // short side fully contained
    assert(cb === inter * 1000000L / nb)
    assert(cb < 900000L)              // long side is NOT contained
    // the same pair FAILS a Jaccard dedup at the same strictness —
    // the asymmetric case is why the operator exists
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      tau = 0.9).collect()
    assert(jac.isEmpty)
    // threshold respected: raising tau past both directions drops it
    assert(Dedup.containmentPairs(docs, "doc_id", "text", 3,
      tauPpm = 1000000L).count() === 1L) // exact containment still 1.0
    // df cap: pairs sharing only hot shingles are out of contract
    val hot = (1L to 12L).map(i => (100L + i, "same hot shingle text"))
    val capped = Dedup.containmentPairs(hot.toDF("doc_id", "text"),
      "doc_id", "text", 3, tauPpm = 500000L, maxDf = 10L)
    assert(capped.count() === 0L)
  }

  test("setJaccardPairs: exact ppm over precomputed sets; df cap; empty sets dropped") {
    // A={a,b,c,d}, B={a,b,c,e} -> 3/5 = 600000 ppm; C={a,b} -> vs A:
    // 2/4 = 500000; D={z} disjoint; E empty (dropped, no quadratic pairing)
    val sets = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e")),
      (3L, Seq("a", "b")),
      (4L, Seq("z")),
      (5L, Seq.empty[String]),
      (6L, Seq.empty[String])).toDF("doc_id", "shs")
    val got = Dedup.setJaccardPairs(sets, tauPpm = 500000L)
      .select($"doc_a", $"doc_b", $"jac_ppm")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 600000L), (1L, 3L, 500000L),
      (2L, 3L, 500000L)))
    // duplicate items inside one set must not inflate the intersection
    val dup = Seq((1L, Seq("a", "a", "b")), (2L, Seq("a", "b")))
      .toDF("doc_id", "shs")
    val d = Dedup.setJaccardPairs(dup, tauPpm = 1L)
      .select($"jac_ppm").as[Long].collect()
    assert(d.toSeq === Seq(1000000L), "array_distinct must apply first")
    // df cap: an item shared by everyone is excluded from candidates
    val hot = (1L to 20L).map(i => (i, Seq("hot", s"u$i")))
      .toDF("doc_id", "shs")
    assert(Dedup.setJaccardPairs(hot, tauPpm = 1L, maxDf = 10L)
      .count() === 0L)
    // guards
    intercept[IllegalArgumentException] {
      Dedup.setJaccardPairs(sets, tauPpm = 0L)
    }
  }
}
