package graft.ops

import graft.SparkSpec

class PrepSpec extends SparkSpec {
  import spark.implicits._

  test("packBins: bins respect the token budget cumulatively, per shard") {
    val docs = Seq(
      (0L, "a b c"), (8L, "d e"), (16L, "f g h i"), // shard 0: 3,2,4 toks
      (1L, "x y z w v")).toDF("doc_id", "text")     // shard 1
    val got = Prep.packBins(docs, "doc_id", "text",
      budgetTokens = 5L, numShards = 8)
      .orderBy("doc_id").collect()
    // shard 0 cumulative: 3 -> bin 0, 5 -> bin 0, 9 -> bin 1
    assert(got.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bin_id"))).toSeq
      === Seq((0L, 0L), (1L, 0L), (8L, 0L), (16L, 1L)))
  }

  test("packBins: empty-prefix and oversized-document edge cases") {
    val docs = Seq(
      (0L, ""),                                  // cum=0 -> bin 0 (guard)
      (8L, (1 to 12).map(_ => "w").mkString(" ")), // 12 > budget: straddles
      (16L, "a b")).toDF("doc_id", "text")       // cum 14 -> bin 2
    val got = Prep.packBins(docs, "doc_id", "text",
      budgetTokens = 5L, numShards = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bin_id"))).toSeq
    assert(got === Seq((0L, 0L), (8L, 2L), (16L, 2L)))
  }

  test("chunkDocs: sliding windows with stride, short tail, no empty docs") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, " "))
      .toDF("doc_id", "text")
    val got = Prep.chunkDocs(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    // starts at tokens 1,4,7,10 -> lengths 4,4,4,1
    assert(got.map(_.getAs[Long]("doc_id")).forall(_ == 1L))
    assert(got.map(_.getAs[Long]("n_chunk_tokens")).toSeq === Seq(4L, 4L, 4L, 1L))
    assert(got.map(_.getAs[String]("chunk_fp")).distinct.length === 4)
  }

  test("clusterSplit: near-dup clusters never straddle the split; singletons covered") {
    // 3 clusters among docs 0..9: {0,1,2}, {5,6}, rest singletons
    val docs = (0L until 10L).map(Tuple1(_)).toDF("doc_id")
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val got = Prep.clusterSplit(docs, "doc_id", clusters, testPpm = 500000L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cluster_id"), r.getAs[String]("split")))
    assert(got.length === 10)
    // every member of a cluster shares the cluster's split decision
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byCluster.values.forall(_.size == 1),
      s"a cluster straddles the split: $got")
    assert(got.filter(_._2 == 0L).map(_._1).toSet === Set(0L, 1L, 2L))
    // singletons resolve to their own id
    assert(got.find(_._1 == 9L).get._2 === 9L)
    // both splits occur at 50% on 7 clusters (md5-bucket sanity)
    assert(got.map(_._3).toSet === Set("train", "test"))
  }

  test("clusterSplit: testPpm bounds enforced; rate tracks the ppm on many singletons") {
    intercept[IllegalArgumentException] {
      Prep.clusterSplit(Seq(Tuple1(1L)).toDF("doc_id"), "doc_id",
        Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"), -1L)
    }
    val docs = (0L until 2000L).map(Tuple1(_)).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val n = Prep.clusterSplit(docs, "doc_id", none, testPpm = 100000L)
      .filter($"split" === "test").count()
    assert(n > 120 && n < 280, s"10% of 2000 expected, got $n")
  }

  test("packSequences: hand-computed bins, separator placement, empty docs dropped") {
    import org.apache.spark.sql.functions._
    // one shard, budget 10: d0 (3 ids -> n 4, cum 4 -> bin 0),
    // d8 (5 ids -> n 6, cum 10 -> bin 0), d16 (4 ids -> n 5, cum 15
    // -> bin 1); d24 empty -> dropped
    val enc = Seq(
      (0L, Seq(11L, 12L, 13L)),
      (8L, Seq(21L, 22L, 23L, 24L, 25L)),
      (16L, Seq(31L, 32L, 33L, 34L)),
      (24L, Seq.empty[Long])).toDF("doc_id", "ids")
    val got = Prep.packSequences(enc, budgetTokens = 10L, numShards = 8,
        eosId = -1L)
      .orderBy("shard", "bin_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    def fp(ids: Seq[Long]) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(ids.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(got === Seq(
      (0L, 0L, 2L, 10L,
        fp(Seq(11L, 12L, 13L, -1L, 21L, 22L, 23L, 24L, 25L, -1L))),
      (0L, 1L, 1L, 5L, fp(Seq(31L, 32L, 33L, 34L, -1L)))))
  }

  test("packSequences: shards pack independently; oversized doc assigned by cumulative end") {
    import org.apache.spark.sql.functions._
    val enc = Seq(
      (1L, (1L to 15L).toSeq), // 15 ids -> n 16, cum 16 -> bin 1 (straddles)
      (2L, Seq(7L, 8L)))       // other shard, bin 0
      .toDF("doc_id", "ids")
    val got = Prep.packSequences(enc, budgetTokens = 10L, numShards = 2,
        eosId = -1L)
      .select("shard", "bin_id", "n_ids")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 16L), (0L, 0L, 3L)))
  }

  test("selectUnderBudget: greedy prefix, inclusive boundary, id tie-break") {
    val docs = Seq(
      (1L, 900L, 4L), (2L, 800L, 5L), (3L, 800L, 3L),
      (4L, 700L, 2L), (5L, 600L, 10L)
    ).toDF("doc_id", "score_ppm", "cost")
    // order: 1(4) -> 2(9) -> 3(12, tie 800 resolves 2 before 3)
    //   -> 4(14 == budget, kept inclusively) -> 5(24, over)
    val got = Prep.selectUnderBudget(docs, "doc_id", "score_ppm",
        "cost", budget = 14L)
      .select("doc_id", "cum_cost").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 4L), (2L, 9L), (3L, 12L), (4L, 14L)))
  }

  test("selectUnderBudgetByGroup: independent per-group prefixes") {
    val docs = Seq(
      ("a", 1L, 900L, 4L), ("a", 2L, 800L, 5L), ("a", 3L, 700L, 4L),
      ("b", 4L, 100L, 6L), ("b", 5L, 950L, 6L)
    ).toDF("src", "doc_id", "score_ppm", "cost")
    // group a: 1(4) -> 2(9 == budget, inclusive) -> 3(13, over)
    // group b: 5(6) -> 4(12, over) — b's low scorer never rides a's
    // leftover budget
    val got = Prep.selectUnderBudgetByGroup(docs, "src", "doc_id",
        "score_ppm", "cost", budgetPerGroup = 9L)
      .select("doc_id", "cum_cost").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 4L), (2L, 9L), (5L, 6L)))
  }

  test("selectUnderBudgetPruned equals the exact form on a large frame") {
    val rnd = new scala.util.Random(41)
    val docs = (1L to 3000L).map(i =>
      (i, rnd.nextInt(1000000).toLong, 1L + rnd.nextInt(50).toLong))
      .toDF("doc_id", "score_ppm", "cost")
    for (budget <- Seq(500L, 5000L, 40000L)) {
      val exact = Prep.selectUnderBudget(docs, "doc_id", "score_ppm",
        "cost", budget).collect().map(_.toSeq).toSet
      val pruned = Prep.selectUnderBudgetPruned(docs, "doc_id",
        "score_ppm", "cost", budget, k = 256).collect()
        .map(_.toSeq).toSet
      assert(pruned === exact, s"diverged at budget $budget")
    }
  }

  test("selectUnderBudgetPruned: cheap high scorers (anti-correlated cost) still select exactly") {
    // high scores on 1-token docs, low scores on 100-token docs — a
    // fixed-fraction stratum holds almost no cost; the coverage loop
    // must widen until the prefix fits (and stay equal to exact)
    val docs = (1L to 2000L).map { i =>
      if (i <= 1000L) (i, 900000L + i, 1L)      // cheap, high score
      else (i, i, 100L)                          // expensive, low score
    }.toDF("doc_id", "score_ppm", "cost")
    val budget = 5000L // needs all 1000 cheap docs + ~40 expensive ones
    val exact = Prep.selectUnderBudget(docs, "doc_id", "score_ppm",
      "cost", budget).collect().map(_.toSeq).toSet
    val pruned = Prep.selectUnderBudgetPruned(docs, "doc_id",
      "score_ppm", "cost", budget, k = 128).collect().map(_.toSeq).toSet
    assert(pruned === exact)
    assert(exact.size > 1000, "the prefix must cross into the expensive tail")
  }

  test("selectUnderBudgetByGroupBudgets: heterogeneous caps, recipe-absent groups excluded") {
    val docs = Seq(
      ("a", 1L, 900L, 4L), ("a", 2L, 800L, 5L), ("a", 3L, 700L, 4L),
      ("b", 4L, 100L, 6L), ("b", 5L, 950L, 6L),
      ("c", 6L, 999L, 1L) // not in the recipe: contributes nothing
    ).toDF("src", "doc_id", "score_ppm", "cost")
    val budgets = Seq(("a", 9L), ("b", 6L)).toDF("src", "budget")
    // a: 1(4) -> 2(9 == budget) -> 3 over; b: 5(6 == budget) -> 4 over
    val got = Prep.selectUnderBudgetByGroupBudgets(docs, "src",
        "doc_id", "score_ppm", "cost", budgets)
      .select("doc_id", "cum_cost").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 4L), (2L, 9L), (5L, 6L)))
  }

  test("selectUnderBudgetByGroupBudgets rejects bad recipes loudly") {
    val docs = Seq(("a", 1L, 1L, 1L))
      .toDF("src", "doc_id", "score_ppm", "cost")
    intercept[IllegalArgumentException] {
      Prep.selectUnderBudgetByGroupBudgets(docs, "src", "doc_id",
        "score_ppm", "cost",
        Seq(("a", 5L), ("a", 7L)).toDF("src", "budget"))
    }
    intercept[IllegalArgumentException] {
      Prep.selectUnderBudgetByGroupBudgets(docs, "src", "doc_id",
        "score_ppm", "cost", Seq(("a", 0L)).toDF("src", "budget"))
    }
  }

  test("selectUnderBudgetByGroupPruned equals the exact map form, skew + anti-correlation included") {
    val rnd = new scala.util.Random(43)
    // group 'big' holds 90% of the rows (the skewed-domain case) and
    // its high scorers are CHEAP (anti-correlated cost); 'sm' is tiny
    val docs = ((1L to 2700L).map { i =>
      if (i <= 1350L) ("big", i, 900000L + i, 1L)
      else ("big", i, i, 100L)
    } ++ (3000L to 3300L).map(i =>
      ("sm", i, rnd.nextInt(1000000).toLong, 1L + rnd.nextInt(30).toLong)))
      .toDF("src", "doc_id", "score_ppm", "cost")
    for (budgets <- Seq(
        Seq(("big", 4000L), ("sm", 300L)),
        Seq(("big", 1000000L), ("sm", 2L)))) { // big cannot spend: degrade
      val b = budgets.toDF("src", "budget")
      val exact = Prep.selectUnderBudgetByGroupBudgets(docs, "src",
        "doc_id", "score_ppm", "cost", b).collect().map(_.toSeq).toSet
      val pruned = Prep.selectUnderBudgetByGroupPruned(docs, "src",
        "doc_id", "score_ppm", "cost", b, k = 128).collect()
        .map(_.toSeq).toSet
      assert(pruned === exact, s"diverged at $budgets")
    }
  }

  test("temperatureBudgets: exact sqrt-temperature split of the total") {
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 300L), // c_a = 400
      ("b", 3L, 100L),                  // c_b = 100 = c_min
      ("c", 4L, 1600L)                  // c_c = 1600
    ).toDF("src", "doc_id", "cost")
    val got = Prep.temperatureBudgets(docs, "src", "cost",
        totalBudget = 1000L)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // weights: a = floor(sqrt(1/4)*1e6) = 500000, b = 1e6, c = 250000
    // sum = 1750000; budgets = floor(1000*w/1750000)
    assert(got("a") === ((400L, 500000L, 285L)))
    assert(got("b") === ((100L, 1000000L, 571L)))
    assert(got("c") === ((1600L, 250000L, 142L)))
    // floor split never over-allocates, under-allocates < #groups
    val tot = got.values.map(_._3).sum
    assert(tot <= 1000L && tot > 1000L - 3L)
  }

  test("temperatureBudgetsEpochs: largest-remainder split is exact; epochs = ceil(budget/mass)") {
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 300L), // c_a = 400
      ("b", 3L, 100L),                  // c_b = 100 = c_min
      ("c", 4L, 1600L)                  // c_c = 1600
    ).toDF("src", "doc_id", "cost")
    val got = Prep.temperatureBudgetsEpochs(docs, "src", "cost",
        totalBudget = 1000L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // bases 285/571/142 leave k = 2; remainders (T·w MOD Σw) are
    // a = 1 250 000, b = 750 000, c = 1 500 000 -> +1 to c then a
    assert(got("a") === ((400L, 500000L, 286L, 1L)))
    assert(got("b") === ((100L, 1000000L, 571L, 6L))) // over-mass: 6 epochs
    assert(got("c") === ((1600L, 250000L, 143L, 1L)))
    // the floor slack is GONE: the split spends the total exactly
    assert(got.values.map(_._3).sum === 1000L)
    // epochs make every budget spendable
    assert(got.values.forall { case (c, _, b, e) => c * e >= b })
  }

  test("selectUnderBudgetByGroupEpochs: repetition rows spend the total exactly on unit costs") {
    // same weight geometry as above at 1/4 mass, unit costs: budgets
    // 286/571/143 over masses 100/25/400 -> a and b are over-mass
    val docs = ((1L to 100L).map(i => ("a", i)) ++
      (200L to 224L).map(i => ("b", i)) ++
      (300L to 699L).map(i => ("c", i)))
      .map { case (g, i) => (g, i, (i * 37L) % 1000L, 1L) }
      .toDF("src", "doc_id", "score_ppm", "cost")
    val budgets = Prep.temperatureBudgetsEpochs(docs, "src", "cost",
        totalBudget = 1000L)
      .filter($"budget" > 0L)
      .select($"src", $"budget", $"epochs")
    val sel = Prep.selectUnderBudgetByGroupEpochs(docs, "src",
      "doc_id", "score_ppm", "cost", budgets)
    val spend = sel.groupBy($"src").agg(
        org.apache.spark.sql.functions.sum($"cost").as("spent"),
        org.apache.spark.sql.functions.max($"epoch").as("maxep"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(spend("a") === ((286L, 3L)))  // 2 full passes + 86
    assert(spend("b") === ((571L, 23L))) // 22 full passes + 21
    assert(spend("c") === ((143L, 1L)))  // under-mass: plain prefix
    assert(spend.values.map(_._1).sum === 1000L) // Σ spend = T exactly
    // epochs 1..e-1 take the WHOLE group: doc 200 appears 23 times
    assert(sel.filter($"doc_id" === 200L).count() >= 22L)
  }

  test("epochs recipe: a factor past the max-epochs contract fails loudly (ADVICE r17)") {
    // a pathological tiny-mass/huge-budget recipe would build an
    // epochs-sized per-row array — the validation must reject it
    // before the explode ever plans
    val docs = Seq(("a", 1L, 10L, 1L))
      .toDF("src", "doc_id", "score_ppm", "cost")
    val bad = Seq(("a", 100000L, Prep.maxEpochs + 1L))
      .toDF("src", "budget", "epochs")
    val e = intercept[IllegalArgumentException] {
      Prep.selectUnderBudgetByGroupEpochs(docs, "src", "doc_id",
        "score_ppm", "cost", bad).collect()
    }
    assert(e.getMessage.contains("max-epochs"))
    // at the bound itself the recipe is accepted
    val ok = Seq(("a", 3L, Prep.maxEpochs))
      .toDF("src", "budget", "epochs")
    assert(Prep.selectUnderBudgetByGroupEpochs(docs, "src", "doc_id",
      "score_ppm", "cost", ok).count() === 3L)
  }

  test("selectUnderBudgetByGroupEpochs with epochs = 1 equals the plain heterogeneous form") {
    val rnd = new scala.util.Random(47)
    val docs = (1L to 400L).map(i =>
      (s"g${i % 3}", i, rnd.nextInt(1000000).toLong,
        1L + rnd.nextInt(20).toLong))
      .toDF("src", "doc_id", "score_ppm", "cost")
    val b = Seq(("g0", 50L), ("g1", 80L), ("g2", 30L))
      .toDF("src", "budget")
    val exact = Prep.selectUnderBudgetByGroupBudgets(docs, "src",
      "doc_id", "score_ppm", "cost", b).collect().map(_.toSeq).toSet
    val ep = Prep.selectUnderBudgetByGroupEpochs(docs, "src",
        "doc_id", "score_ppm", "cost",
        b.withColumn("epochs", org.apache.spark.sql.functions.lit(1L)))
      .drop("epoch").collect().map(_.toSeq).toSet
    assert(ep === exact)
  }

  test("selectUnderBudgetPruned skip paths equal exact (finest-rung sample proof; m < k)") {
    val rnd = new scala.util.Random(53)
    // m == k frame with a budget tiny enough that the top-8 sampled
    // costs alone prove the finest rung covers — the pricing scan is
    // skipped and the rung picked must be the pass's own
    val big = (1L to 5000L).map(i =>
      (i, rnd.nextInt(1000000).toLong, 1L + rnd.nextInt(40).toLong))
      .toDF("doc_id", "score_ppm", "cost")
    // m < k frame: the sample holds every scoring row, pricing runs
    // exactly driver-side (both covering and degrade budgets)
    val small = (1L to 60L).map(i =>
      (i, rnd.nextInt(1000000).toLong, 1L + rnd.nextInt(10).toLong))
      .toDF("doc_id", "score_ppm", "cost")
    for ((docs, budget, kk) <- Seq(
        (big, 30L, 128), (big, 200L, 128),
        (small, 40L, 128), (small, 100000L, 128))) {
      val exact = Prep.selectUnderBudget(docs, "doc_id", "score_ppm",
        "cost", budget).collect().map(_.toSeq).toSet
      val pruned = Prep.selectUnderBudgetPruned(docs, "doc_id",
        "score_ppm", "cost", budget, k = kk).collect()
        .map(_.toSeq).toSet
      assert(pruned === exact, s"diverged at budget $budget")
    }
  }

  test("skip paths FIRE: a NULL cost the pricing pass fail-closes on goes unread") {
    // behavioral detector (round-17 review: result equality alone
    // holds on BOTH paths, so it cannot prove the skip happened): a
    // planted (NULL score, NULL cost) row sits outside the sample
    // and outside every stratum — the pricing pass's corpus-wide
    // bucket aggregate REQUIRE-fails on it, so completing without an
    // exception proves the pricing scan was skipped
    def mk(n: Int) = {
      val rnd = new scala.util.Random(59)
      (1 to n).map(i => (i.toLong,
        Some(rnd.nextInt(1000000).toLong),
        Some(1L + rnd.nextInt(40).toLong)))
    }
    for ((n, budget) <- Seq((5000, 30L) /* finest-rung skip */,
        (60, 40L) /* m < k skip */)) {
      val clean = mk(n)
      val planted = (clean :+
          ((999999L, None: Option[Long], None: Option[Long])))
        .toDF("doc_id", "score_ppm", "cost")
      val exact = Prep.selectUnderBudget(
        clean.toDF("doc_id", "score_ppm", "cost"), "doc_id",
        "score_ppm", "cost", budget).collect().map(_.toSeq).toSet
      val pruned = Prep.selectUnderBudgetPruned(planted, "doc_id",
        "score_ppm", "cost", budget, k = 128).collect()
        .map(_.toSeq).toSet
      assert(pruned === exact, s"diverged at n=$n budget=$budget")
    }
    // and when NO skip covers (budget far past the sample mass), the
    // pricing pass still fail-closes on the same planted frame
    val planted = (mk(5000) :+
        ((999999L, None: Option[Long], None: Option[Long])))
      .toDF("doc_id", "score_ppm", "cost")
    val e = intercept[IllegalArgumentException] {
      Prep.selectUnderBudgetPruned(planted, "doc_id", "score_ppm",
        "cost", budget = 100000L, k = 128).collect()
    }
    assert(e.getMessage.contains("NULL costs"))
  }

  test("selectUnderBudgetPruned equals exact on the non-binding boundaries") {
    val docs = Seq((1L, 10L, 3L), (2L, 5L, 4L))
      .toDF("doc_id", "score_ppm", "cost")
    // budget > total and budget == total: both forms keep every row
    // (round-15 review: the earlier hard reject diverged on these)
    for (budget <- Seq(100L, 7L)) {
      val exact = Prep.selectUnderBudget(docs, "doc_id", "score_ppm",
        "cost", budget).collect().map(_.toSeq).toSet
      val pruned = Prep.selectUnderBudgetPruned(docs, "doc_id",
        "score_ppm", "cost", budget).collect().map(_.toSeq).toSet
      assert(pruned === exact, s"diverged at budget $budget")
      assert(exact.size === 2)
    }
  }
}
