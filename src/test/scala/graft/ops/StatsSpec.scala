package graft.ops

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("discretePercentiles: hand-checked ranks, edges, duplicates") {
    val d10 = (1L to 10L).toDF("x")
    val r = Stats.discretePercentiles(d10, "x", Seq(0.0, 0.5, 1.0)).head()
    // rank floor((10-1)*p)+1 over 1..10: p0 -> 1, p50 -> 5, p100 -> 10
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 5L, 10L)))

    val dup = Seq(1L, 1L, 1L, 2L).toDF("x")
    val r2 = Stats.discretePercentiles(dup, "x", Seq(0.5, 1.0)).head()
    assert((r2.getLong(0), r2.getLong(1)) === ((1L, 2L)))
  }

  test("discretePercentiles is partitioning-independent") {
    val d = Seq.tabulate(500)(i => (i % 37).toLong).toDF("x")
    val a = Stats.discretePercentiles(d, "x", Seq(0.25, 0.9)).head()
    val b = Stats.discretePercentiles(d.repartition(13), "x",
      Seq(0.25, 0.9)).head()
    assert(a === b)
  }

  test("binnedQuantiles: exact when binWidth=1, bounded error otherwise") {
    // binWidth=1 degenerates to one value per bin: interpolation offset
    // is always 0 and the estimate IS the exact discrete percentile
    val d = Seq.tabulate(300)(i => ((i * 7) % 101).toLong).toDF("x")
    val exact = Stats.discretePercentiles(d, "x", Seq(0.5, 0.95)).head()
    val fine = Stats.binnedQuantiles(d, "x", 1L, Seq(50, 95)).head()
    assert(fine.getLong(0) === exact.getLong(0))
    assert(fine.getLong(1) === exact.getLong(1))
    // coarse bins: estimate stays within one bin width of exact
    val coarse = Stats.binnedQuantiles(d, "x", 16L, Seq(50, 95)).head()
    assert(math.abs(coarse.getLong(0) - exact.getLong(0)) <= 16L)
    assert(math.abs(coarse.getLong(1) - exact.getLong(1)) <= 16L)
  }

  test("binnedQuantiles is partitioning-independent (exact int64 path)") {
    val d = Seq.tabulate(400)(i => ((i * 13) % 211).toLong).toDF("x")
    val a = Stats.binnedQuantiles(d, "x", 8L, Seq(25, 50, 99)).head()
    val b = Stats.binnedQuantiles(d.repartition(17), "x", 8L,
      Seq(25, 50, 99)).head()
    assert(a === b)
  }

  test("binnedQuantiles error stays within one bin width (randomized property)") {
    val pcts = Seq(10, 50, 90, 99)
    val pds = Seq(0.10, 0.50, 0.90, 0.99)
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      // skewed long-tail values — the shape quantile sketches get wrong
      val d = Seq.fill(600)(
        math.pow(rnd.nextDouble(), 3.0) * 5000).map(_.toLong).toDF("x")
      val exact = Stats.discretePercentiles(d, "x", pds).head()
      val est = Stats.binnedQuantiles(d, "x", 32L, pcts).head()
      for (i <- pcts.indices) {
        val diff = math.abs(est.getLong(i) - exact.getLong(i))
        assert(diff <= 32L,
          s"seed=$seed p${pcts(i)}: est=${est.getLong(i)} " +
            s"exact=${exact.getLong(i)} diff=$diff > binWidth")
      }
    }
  }

  test("discretePercentilesBy equals per-group brute-force sorted picks") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = for (g <- Seq("a", "b", "c"); _ <- 1 to (300 + g.hashCode.abs % 100))
      yield (g, rnd.nextInt(500).toLong)
    val df = rows.toDF("g", "x")
    val ps = Seq(0.25, 0.5, 0.95)
    val got = Stats.discretePercentilesBy(df, "g", "x", ps)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getLong(i + 1))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted.toIndexedSeq
      val want = ps.map(p =>
        sorted(math.floor((sorted.size - 1) * p).toInt))
      assert(got(g) === want, s"group $g")
    }
    // each group ranks independently: per-group result equals the
    // global operator run on that group's slice alone
    val aOnly = Stats.discretePercentiles(df.filter($"g" === "a"), "x", ps)
      .head()
    assert(got("a") === ps.indices.map(i => aOnly.getLong(i)))
  }

  test("weightedMedianBy: half-weight convention, ties, degenerate single value") {
    import spark.implicits._
    val df = Seq(
      // group a: values 1 (w 1), 2 (w 1), 3 (w 10) -> total 12,
      // half = 6 -> first v with 2*cum >= 12 is 3
      ("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 10.0),
      // group b: symmetric weights -> 2*cum(1) = 10 >= 10 -> lower
      // median 1 (the LOWER convention on an exact half)
      ("b", 1L, 5.0), ("b", 2L, 5.0),
      // group c: one value
      ("c", 7L, 0.5)
    ).toDF("g", "v", "w")
    val got = Stats.weightedMedianBy(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 1L, "c" -> 7L))
    // unweighted degenerates to the plain lower median (w = 1)
    val rnd = new scala.util.Random(67)
    val rows = (1 to 200).map(_ => ("z", rnd.nextInt(30).toLong, 1.0))
    val wm = Stats.weightedMedianBy(rows.toDF("g", "v", "w"), "g", "v", "w")
      .head().getLong(1)
    val sorted = rows.map(_._2).sorted
    // lower weighted median with unit weights = value at
    // ceil(n/2)-th position (1-based)
    assert(wm === sorted((rows.size + 1) / 2 - 1))
  }

  test("weightedMedianBy: negative weights are rejected, zero weights are fine") {
    import spark.implicits._
    // a negative weight makes the cumulative sum non-monotone — the
    // 2*cum >= tot pick no longer names a weighted median (ADVICE r10)
    val bad = Seq(("a", 1L, 2.0), ("a", 2L, -1.0)).toDF("g", "v", "w")
    val ex = intercept[Exception] {
      Stats.weightedMedianBy(bad, "g", "v", "w").collect()
    }
    assert(ex.getMessage.contains("negative weight"))
    // zero weights keep monotonicity — allowed, and never selected
    // unless they sit at the crossing value anyway
    val ok = Seq(("a", 1L, 0.0), ("a", 2L, 3.0), ("a", 3L, 1.0))
      .toDF("g", "v", "w")
    assert(Stats.weightedMedianBy(ok, "g", "v", "w")
      .head().getLong(1) === 2L)
  }

  test("madOutliersBy: exact median/MAD fence, per group, robust to the outlier itself") {
    import spark.implicits._
    // group a: tight cluster around 100 plus two gross artifacts —
    // the artifacts must not drag the fence (that's the point of MAD)
    val a = Seq.tabulate(21)(i => ("a", 95L + i)) ++
      Seq(("a", 100000L), ("a", 0L))
    // group b: wider spread, no artifact -> nothing flagged
    val b = Seq.tabulate(20)(i => ("b", 50L * i))
    val df = (a ++ b).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    val got = Stats.madOutliersBy(df, "g", "v", k = 3)
      .select("id", "g", "v", "med", "mad", "adev").collect()
    // driver-side reference: exact lower-discrete median/MAD per group
    def lowMed(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(math.floor((s.size - 1) * 0.5).toInt)
    }
    val rows = (a ++ b).zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
    val want = rows.groupBy(_._2).flatMap { case (g, grp) =>
      val med = lowMed(grp.map(_._3))
      val mad = lowMed(grp.map(x => math.abs(x._3 - med)))
      grp.filter(x => math.abs(x._3 - med) > 3L * mad)
        .map(x => (x._1, g, x._3, med, mad, math.abs(x._3 - med)))
    }.toSet
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet === want)
    // the two artifacts in group a are flagged; group b is clean
    assert(want.count(_._2 == "a") === 2 && !want.exists(_._2 == "b"))
  }

  test("madOutliersSketchBy: saturated sample equals the exact fence; sub-sampled is deterministic") {
    import spark.implicits._
    val a = Seq.tabulate(21)(i => ("a", 95L + i)) ++
      Seq(("a", 100000L), ("a", 0L))
    val b = Seq.tabulate(20)(i => ("b", 50L * i))
    val df = (a ++ b).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    def snap(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "g", "v", "med", "mad", "adev").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // sampleK saturates every group -> the ceil-rank sample median IS
    // the exact lower median, so the sketch form equals madOutliersBy
    val exact = snap(Stats.madOutliersBy(df, "g", "v", k = 3))
    val saturated = snap(
      Stats.madOutliersSketchBy(df, "g", "v", "id", sampleK = 100, k = 3))
    assert(saturated === exact,
      "saturated sketch fence must equal the exact fence")
    // sub-sampled: the fence is approximate but the flagged set is a
    // pure function of the row multiset (partitioning-invariant), and
    // the gross artifacts still breach any sane fence
    val sub = snap(Stats.madOutliersSketchBy(df, "g", "v", "id",
      sampleK = 8, k = 3))
    val sub2 = snap(Stats.madOutliersSketchBy(df.repartition(7), "g", "v",
      "id", sampleK = 8, k = 3))
    assert(sub === sub2, "sketch fence must be partitioning-invariant")
    assert(sub.exists(x => x._2 == "a" && x._3 == 100000L),
      "the gross artifact must breach the sampled fence")
  }

  test("winsorizeBy: clamps at sketch edges; NULLs stay NULL; all-null group passes through") {
    import spark.implicits._
    // group a: 1..10 fully sampled -> lo = vs[(200*10+999)//1000 = 2]
    // = 2, hi = vs[(900*10+999)//1000 = 9] = 9
    val a = (1 to 10).map(i => ("a", i.toLong, Some(i.toLong)))
    val rows = a ++ Seq(("a", 99L, None), ("b", 100L, None), ("b", 101L, None))
    val got = Stats.winsorizeBy(rows.toDF("g", "id", "v"),
        "g", "cast(id as string)", "v", loPermille = 200, hiPermille = 900)
      .select($"g", $"id", $"v_w").as[(String, Long, Option[Long])]
      .collect().map(x => (x._1, x._2) -> x._3).toMap
    assert(got(("a", 1L)).contains(2L), "below lo clamps up")
    assert(got(("a", 10L)).contains(9L), "above hi clamps down")
    assert((2 to 9).forall(i => got(("a", i.toLong)).contains(i.toLong)))
    assert(got(("a", 99L)).isEmpty, "NULL value stays NULL")
    assert(got(("b", 100L)).isEmpty && got(("b", 101L)).isEmpty,
      "all-null group passes through")
  }

  test("winsorizeBy: NULL group keys clamp into the NULL group's band") {
    import spark.implicits._
    // the NULL group is a real equivalence class to groupBy: its rows
    // must receive the band the sketch computed FROM them (ADVICE r12
    // — a non-null-safe join silently passed them through unclamped)
    val rows = (1 to 10).map(i => (None: Option[String], i.toLong,
      Some(i.toLong))) ++ Seq((Some("a"), 90L, Some(0L)),
      (Some("a"), 91L, Some(5L)))
    val got = Stats.winsorizeBy(rows.toDF("g", "id", "v"),
        "g", "cast(id as string)", "v", loPermille = 200, hiPermille = 900)
      .select($"id", $"v_w").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(2L), "NULL-group row below lo clamps up")
    assert(got(10L).contains(9L), "NULL-group row above hi clamps down")
    assert((2 to 9).forall(i => got(i.toLong).contains(i.toLong)))
    // the non-null group keeps its own (degenerate two-value) band
    assert(got(90L).contains(0L) && got(91L).contains(5L))
  }

  test("distributionDrift: empty or all-NULL reference fails diagnosably") {
    import spark.implicits._
    val cur = Seq((1L, Some(3L))).toDF("id", "v")
    val emptyRef = cur.filter($"id" < 0L)
    val nullRef = Seq((1L, None: Option[Long])).toDF("id", "v")
    for (ref <- Seq(emptyRef, nullRef)) {
      val ex = intercept[IllegalArgumentException] {
        Stats.distributionDrift(ref, cur, "cast(id as string)", "v",
          nBins = 2, k = 16)
      }
      assert(ex.getMessage.contains("reference"),
        s"message must name the empty reference, got: ${ex.getMessage}")
    }
  }

  test("distributionDrift: hand-computed bins, rates and TVD") {
    import spark.implicits._
    // ref 1..10, one edge at the sketch median: full sample (k=512)
    // -> p500 = 5 -> bins: v<=5 -> 0, v>5 -> 1
    val ref = (1 to 10).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val curSame = ref
    val curShift = (6 to 15).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    def run(cur: org.apache.spark.sql.DataFrame) =
      Stats.distributionDrift(ref, cur, "cast(id as string)", "v",
        nBins = 2, k = 512)
        .select("bin", "n_ref", "n_cur", "rate_ref_ppm", "rate_cur_ppm",
          "diff_ppm", "tvd_ppm")
        .as[(Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    assert(run(curSame) == Seq(
      (0L, 5L, 5L, 500000L, 500000L, 0L, 0L),
      (1L, 5L, 5L, 500000L, 500000L, 0L, 0L)))
    assert(run(curShift) == Seq(
      (0L, 5L, 0L, 500000L, 0L, 500000L, 500000L),
      (1L, 5L, 10L, 500000L, 1000000L, 500000L, 500000L)))
  }

  test("distributionDrift: NULLs excluded, identical corpora drift zero") {
    import spark.implicits._
    val a = Seq((1L, Some(3L)), (2L, Some(7L)), (3L, None), (4L, Some(9L)))
      .toDF("id", "v")
    val r = Stats.distributionDrift(a, a, "cast(id as string)", "v",
        nBins = 3, k = 16)
      .agg(org.apache.spark.sql.functions.max("tvd_ppm"),
        org.apache.spark.sql.functions.sum("n_ref"),
        org.apache.spark.sql.functions.sum("n_cur"))
      .as[(Long, Long, Long)].collect().head
    assert(r == ((0L, 3L, 3L)))
  }
}
