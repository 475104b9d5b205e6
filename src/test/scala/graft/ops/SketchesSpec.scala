package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate is accurate and bit-identical on any partitioning") {
    val df = spark.range(0, 20000).select(($"id" % 3000).as("v"))
    val r = Sketches.hllDistinctAudit(df, col("v")).head()
    val est = r.getAs[Double]("estimate")
    val exact = r.getAs[Long]("n_exact")
    assert(exact === 3000L)
    // 1024 registers -> ~1.04/sqrt(1024) = 3.25% typical error; be generous
    assert(math.abs(est - exact) / exact < 0.15,
      s"estimate $est too far from $exact")
    // determinism: a different partitioning yields the SAME double
    val r2 = Sketches.hllDistinctAudit(df.repartition(7), col("v")).head()
    assert(r2.getAs[Double]("estimate") === est)
    assert(r2.getAs[Long]("n_zero") === r.getAs[Long]("n_zero"))
  }

  test("CMS estimates dominate exact counts; deterministic; absent keys ok") {
    val df = spark.range(0, 5000).select(($"id" % 50).cast("string").as("v"))
    val keys = Seq("0", "7", "49", "absent")
    val rows = Sketches.cmsFrequencyAudit(df, col("v"), keys, d = 4, w = 256)
      .collect().map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("est"), r.getAs[Long]("n_exact"))).toMap
    assert(rows.keySet === keys.toSet)
    // every value 0..49 appears exactly 100 times
    assert(rows("0")._2 === 100L && rows("7")._2 === 100L)
    assert(rows("absent")._2 === 0L)
    // the CMS guarantee: never underestimates
    assert(rows.values.forall { case (est, exact) => est >= exact })
    // deterministic across partitionings
    val again = Sketches.cmsFrequencyAudit(df.repartition(5), col("v"),
      keys, d = 4, w = 256).collect()
      .map(r => r.getAs[String]("tok") -> r.getAs[Long]("est")).toMap
    assert(keys.forall(k => again(k) === rows(k)._1))
  }

  test("HLL small-range branch: tiny cardinalities use linear counting") {
    val df = Seq(1L, 2L, 3L, 2L, 1L).toDF("v")
    val r = Sketches.hllDistinctAudit(df, col("v")).head()
    assert(r.getAs[Long]("n_exact") === 3L)
    // 3 distinct values fill at most 3 of 1024 registers -> linear
    // counting branch; estimate must be within 1 of the truth there
    assert(math.abs(r.getAs[Double]("estimate") - 3.0) < 1.0)
  }

  test("HLL on an EMPTY input estimates 0, not NULL (ADVICE r4)") {
    val df = Seq.empty[Long].toDF("v")
    val r = Sketches.hllDistinctAudit(df, col("v")).head()
    assert(!r.isNullAt(r.fieldIndex("estimate")))
    assert(r.getAs[Double]("estimate") === 0.0)
    assert(r.getAs[Long]("n_zero") === 1024L)
  }

  test("Bloom filter: no false negatives; one-sided bound; tiny m saturates") {
    val df = (0L until 100L).toDF("v")
    val probes = Seq("0", "5", "99", "x1", "x2", "x3", "x4", "x5")
    val rows = Sketches.bloomMembershipAudit(df, col("v"), probes,
        m = 4096, k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet === probes.toSet)
    // every present probe is found; in_bloom >= in_exact everywhere
    Seq("0", "5", "99").foreach(t => assert(rows(t) === ((1L, 1L))))
    rows.values.foreach { case (ex, bl) => assert(bl >= ex) }
    // absent probes under a roomy filter: 300 set bits of 4096 ->
    // P(single FP) ~ (300/4096)^3 ~ 4e-4; these 5 fixed probes were
    // checked to be negatives (deterministic hashes, not luck)
    Seq("x1", "x2", "x3", "x4", "x5").foreach(t =>
      assert(rows(t) === ((0L, 0L))))
    // saturated filter (m=8): every probe positive, present or not —
    // the undersized-m failure mode the q88 audit makes measurable
    val sat = Sketches.bloomMembershipAudit(df, col("v"), probes,
        m = 8, k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(sat.values.forall(_ === 1L))
  }

  test("grouped HLL: fine-grain partials roll up losslessly; per-group estimates track exact") {
    import spark.implicits._
    // 3 types x 4 days; distinct users per type differ (300/600/900)
    val df = spark.range(0, 30000).select(
      concat(lit("t"), ($"id" % 3).cast("string")).as("typ"),
      ($"id" % 4).cast("string").as("day"),
      (($"id" % 3) * 10000 +
        when($"id" % 3 === 0, $"id" % 300)
          .when($"id" % 3 === 1, $"id" % 600)
          .otherwise($"id" % 900)).as("user"))
    val fine = Sketches.hllPartials(df, Seq("typ", "day"), $"user", b = 10)
    val direct = Sketches.hllPartials(df, Seq("typ"), $"user", b = 10)
    val rolled = Sketches.hllRollup(fine, Seq("typ"))
    // merge property: register max of day maxes == direct type max
    assert(rolled.exceptAll(direct).isEmpty &&
      direct.exceptAll(rolled).isEmpty, "rollup != direct partials")
    // estimates within HLL error (~3.3% at m=1024; allow 4 sigma)
    val est = Sketches.hllGroupEstimate(rolled, Seq("typ"), b = 10)
      .collect().map(r => r.getAs[String]("typ") ->
        r.getAs[Double]("estimate")).toMap
    val exact = df.groupBy($"typ").agg(countDistinct($"user").as("n"))
      .collect().map(r => r.getAs[String]("typ") -> r.getAs[Long]("n")).toMap
    exact.foreach { case (t, n) =>
      val rel = math.abs(est(t) - n) / n.toDouble
      assert(rel < 0.13, s"type $t: estimate ${est(t)} vs exact $n ($rel)")
    }
  }

  test("heavyHitters: exact under the gate; saturated sketch still exact") {
    import spark.implicits._
    // 5 heavy tokens x 500 + 8000 rare singletons
    val heavy = spark.range(0, 2500)
      .select(concat(lit("H"), ($"id" % 5).cast("string")).as("v"))
    val rare = spark.range(0, 8000)
      .select(concat(lit("r"), $"id".cast("string")).as("v"))
    val df = heavy.unionByName(rare)
    def exact(th: Long) = df.groupBy($"v".as("tok"))
      .agg(count(lit(1)).as("n")).filter($"n" >= th)
      .orderBy($"tok").collect().toSeq
    val got = Sketches.heavyHitters(df, $"v", threshold = 500L,
        d = 4, w = 4096)
      .orderBy($"tok").collect().toSeq
    assert(got === exact(500L) && got.size === 5)
    // a hopelessly undersized sketch (w=2: every cell saturates, the
    // gate passes everything) must still be EXACT — only slower
    val sat = Sketches.heavyHitters(df, $"v", threshold = 500L,
        d = 2, w = 2)
      .orderBy($"tok").collect().toSeq
    assert(sat === exact(500L))
    // a threshold below every count returns the full exact histogram
    val all = Sketches.heavyHitters(df, $"v", threshold = 1L,
        d = 4, w = 4096)
    assert(all.count() === 8005L)
  }

  test("HLL summary asset: incremental refresh equals one-shot; removal forces rebuild") {
    import spark.implicits._
    def mk(lo: Long, hi: Long) = spark.range(lo, hi).select(
      ($"id" % 3).cast("string").as("g"), ($"id" % 500).as("u"))
    graft.Tables.writeTable(mk(0, 4000).repartition(2), "skspec_hll_base")
    Sketches.writeHllSummary(spark.table("skspec_hll_base"),
      "skspec_hll_sum", Seq("g"), "u", b = 8)
    Layout.appendPlain(mk(4000, 6000).repartition(1), "skspec_hll_base")
    val r1 = Sketches.refreshHllSummary(spark,
      spark.table("skspec_hll_base"), "skspec_hll_sum")
    assert(r1 === 1L, s"refresh should read the 1 delta file, read $r1")
    val oneShot = Sketches.hllPartials(spark.table("skspec_hll_base"),
      Seq("g"), $"u", b = 8)
    assert(spark.table("skspec_hll_sum").exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(spark.table("skspec_hll_sum")).isEmpty,
      "incremental registers != one-shot registers")
    // replace the base wholesale -> removal -> sound full rebuild
    graft.Tables.writeTable(mk(0, 1000).repartition(3), "skspec_hll_base")
    val r2 = Sketches.refreshHllSummary(spark,
      spark.table("skspec_hll_base"), "skspec_hll_sum")
    assert(r2 === 3L, s"rebuild should read the 3 current files, read $r2")
    val rebuilt = Sketches.hllPartials(spark.table("skspec_hll_base"),
      Seq("g"), $"u", b = 8)
    assert(spark.table("skspec_hll_sum").exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(spark.table("skspec_hll_sum")).isEmpty)
  }

  test("KMV: saturated sketch is exact; estimator accurate at k << n; mergeable") {
    import spark.implicits._
    // A = 0..599, B = 400..999 -> |inter| = 200, |union| = 1000, J = 0.2
    val a = (0 until 600).map(_.toString).toDF("v")
    val b = (400 until 1000).map(_.toString).toDF("v")
    def audit(k: Int) =
      Sketches.kmvOverlapAudit(a, col("v"), b, col("v"), k).head()
    // k >= |union|: U covers everything, the estimate IS the exact J
    val full = audit(2048)
    assert(full.getAs[Long]("u_size") === 1000L)
    assert(full.getAs[Long]("kmv_matches") === 200L)
    assert(full.getAs[Long]("n_a") === 600L &&
      full.getAs[Long]("n_b") === 600L &&
      full.getAs[Long]("exact_inter") === 200L)
    assert(full.getAs[Double]("est_j") === full.getAs[Double]("exact_j"))
    // k << n: deterministic estimate within ~4/sqrt(k) of J = 0.2
    val small = audit(256)
    assert(small.getAs[Long]("u_size") === 256L)
    val err = math.abs(small.getAs[Double]("est_j") - 0.2)
    assert(err < 4.0 / math.sqrt(256.0), s"KMV error $err too large")
    // mergeability: the union's sketch equals the bottom-k of the two
    // sketches' union — the property that lets sketches combine
    // without corpus access
    val fromSketches = Sketches.kmvSketch(a, col("v"), 64)
      .unionByName(Sketches.kmvSketch(b, col("v"), 64))
      .distinct().orderBy(col("h")).limit(64).as[String].collect().toSeq
    val fromCorpus = Sketches.kmvSketch(a.unionByName(b), col("v"), 64)
      .as[String].collect().toSeq
    assert(fromSketches === fromCorpus)
  }

  test("hllIntersectionAudit: tracks exact overlap; union from register merge; clamp at 0") {
    import spark.implicits._
    // A = 0..1999, B = 1000..3999 -> exact intersection 1000
    val a = (0L until 2000L).toDF("v")
    val b = (1000L until 4000L).toDF("v")
    val r = Sketches.hllIntersectionAudit(a, col("v"), b, col("v")).head()
    assert(r.getAs[Long]("n_exact_inter") === 1000L)
    // HLL at b=10 has ~3.25% standard error; inclusion-exclusion
    // compounds three estimates — allow 15% on the intersection
    val est = r.getAs[Double]("est_inter")
    assert(math.abs(est - 1000.0) / 1000.0 < 0.15, s"est_inter=$est")
    // union estimate tracks |A ∪ B| = 4000
    assert(math.abs(r.getAs[Double]("est_union") - 4000.0) / 4000.0 < 0.1)
    // disjoint sets: exact 0, estimate clamped to >= 0
    val c = (100000L until 102000L).toDF("v")
    val dj = Sketches.hllIntersectionAudit(a, col("v"), c, col("v")).head()
    assert(dj.getAs[Long]("n_exact_inter") === 0L)
    assert(dj.getAs[Double]("est_inter") >= 0.0)
  }

  test("cmsJoinSizeAudit: est >= exact; collision-free width is exact; disjoint keys -> 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // many-to-many: keys 0..19 with skewed multiplicities per side
    val a = Seq.fill(300)(rnd.nextInt(20).toLong).toDF("k")
    val b = Seq.fill(500)(rnd.nextInt(20).toLong).toDF("k")
    val exactRef = {
      val ca = a.as[Long].collect().groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val cb = b.as[Long].collect().groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
    }
    val tight = Sketches.cmsJoinSizeAudit(a, col("k"), b, col("k"),
      d = 3, w = 16).head()
    assert(tight.getAs[Long]("n_exact") === exactRef)
    assert(tight.getAs[Long]("est_join_rows") >= exactRef,
      "CMS inner product must dominate the exact join size")
    // collision-free width: the estimate IS the exact size
    val wide = Sketches.cmsJoinSizeAudit(a, col("k"), b, col("k"),
      d = 2, w = 1 << 16).head()
    assert(wide.getAs[Long]("est_join_rows") === exactRef)
    // disjoint key spaces: exact 0 (coalesced, not NULL); estimate
    // may be > 0 only through collisions at tiny w
    val c = Seq.fill(100)(100L + rnd.nextInt(20)).toDF("k")
    val dj = Sketches.cmsJoinSizeAudit(a, col("k"), c, col("k"),
      d = 2, w = 1 << 16).head()
    assert(dj.getAs[Long]("n_exact") === 0L)
    assert(dj.getAs[Long]("est_join_rows") === 0L)
  }

  // ---------------------------------------------------------- quantiles

  private def qsFixture(n: Long) = spark.range(0, n).select(
    ($"id" % 3).cast("string").as("g"),
    $"id".cast("string").as("rk"),
    // per-group uniform 0..(n/3 - 1): exact quantiles are known
    ($"id" / 3).cast("long").cast("double").as("x"))

  test("quantile sketch: estimates track exact quantiles within the DKW bound") {
    val n = 30000L
    val perGroup = n / 3
    val sk = Sketches.quantilePartials(qsFixture(n), Seq("g"),
      col("rk"), col("x"), k = 512)
    val got = Sketches.quantileEstimates(sk, Seq("g"), Seq(500, 900, 990))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === Set("0", "1", "2"))
    // DKW: rank error ~ sqrt(ln(2/delta)/(2*512)) ≈ 7% at 99% conf;
    // on uniform data value error ≈ rank error — allow 10% of range
    val tol = 0.10 * perGroup
    got.values.foreach { case (m, p500, p900, p990) =>
      assert(m === 512L)
      assert(math.abs(p500 - 0.50 * perGroup) < tol, s"p500 $p500")
      assert(math.abs(p900 - 0.90 * perGroup) < tol, s"p900 $p900")
      assert(math.abs(p990 - 0.99 * perGroup) < tol, s"p990 $p990")
    }
    // order-invariance: a different partitioning yields the SAME rows
    val sk2 = Sketches.quantilePartials(qsFixture(n).repartition(7),
      Seq("g"), col("rk"), col("x"), k = 512)
    assert(sk.exceptAll(sk2).isEmpty && sk2.exceptAll(sk).isEmpty,
      "sketch must be a pure function of the row multiset")
  }

  test("quantile sketch: merge of disjoint parts is BIT-EQUAL to the one-shot sketch") {
    val df = qsFixture(12000)
    val one = Sketches.quantilePartials(df, Seq("g"), col("rk"), col("x"), 256)
    val a = Sketches.quantilePartials(df.filter($"rk".cast("long") % 2 === 0),
      Seq("g"), col("rk"), col("x"), 256)
    val b = Sketches.quantilePartials(df.filter($"rk".cast("long") % 2 =!= 0),
      Seq("g"), col("rk"), col("x"), 256)
    val merged = Sketches.quantileMerge(a.unionByName(b), Seq("g"), 256)
    assert(one.exceptAll(merged).isEmpty && merged.exceptAll(one).isEmpty,
      "bottom-k merge must equal the one-shot bottom-k — the property " +
        "KLL/t-digest cannot give and the reason this sketch is a sample")
    // saturation: k >= group size -> the sketch IS the group, and the
    // permille serve is the exact lower quantile
    val small = qsFixture(300) // 100 per group
    val skAll = Sketches.quantilePartials(small, Seq("g"),
      col("rk"), col("x"), k = 1000)
    val est = Sketches.quantileEstimates(skAll, Seq("g"), Seq(500, 1000))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    est.values.foreach { case (m, p500, p1000) =>
      assert(m === 100L)
      assert(p500 === 49.0, "exact lower median of 0..99 at saturation")
      assert(p1000 === 99.0)
    }
  }

  test("quantile summary asset: delta refresh is bit-equal to one-shot; removal rebuilds") {
    def mk(lo: Long, hi: Long) = spark.range(lo, hi).select(
      ($"id" % 3).cast("string").as("g"), $"id".cast("string").as("rk"),
      ($"id" % 997).cast("double").as("x"))
    graft.Tables.writeTable(mk(0, 4000).repartition(2), "skspec_qs_base")
    Sketches.writeQuantileSummary(spark.table("skspec_qs_base"),
      "skspec_qs_sum", Seq("g"), "rk", "x", k = 128)
    Layout.appendPlain(mk(4000, 6000).repartition(1), "skspec_qs_base")
    val r1 = Sketches.refreshQuantileSummary(spark,
      spark.table("skspec_qs_base"), "skspec_qs_sum")
    assert(r1 === 1L, s"refresh should read the 1 delta file, read $r1")
    val oneShot = Sketches.quantilePartials(spark.table("skspec_qs_base"),
      Seq("g"), col("rk"), col("x"), 128)
    assert(spark.table("skspec_qs_sum").exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(spark.table("skspec_qs_sum")).isEmpty,
      "incremental sample != one-shot sample")
    // replace the base wholesale -> removal -> sound full rebuild
    graft.Tables.writeTable(mk(0, 1000).repartition(3), "skspec_qs_base")
    val r2 = Sketches.refreshQuantileSummary(spark,
      spark.table("skspec_qs_base"), "skspec_qs_sum")
    assert(r2 === 3L, s"rebuild should read the 3 current files, read $r2")
    val rebuilt = Sketches.quantilePartials(spark.table("skspec_qs_base"),
      Seq("g"), col("rk"), col("x"), 128)
    assert(spark.table("skspec_qs_sum").exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(spark.table("skspec_qs_sum")).isEmpty)
    // no-op: nothing changed since the rebuild
    assert(Sketches.refreshQuantileSummary(spark,
      spark.table("skspec_qs_base"), "skspec_qs_sum") === 0L)
  }
}
