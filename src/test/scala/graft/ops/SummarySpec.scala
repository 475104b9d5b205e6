package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.SparkSpec

class SummarySpec extends SparkSpec {
  import spark.implicits._

  private def baseData(n: Long): DataFrame =
    spark.range(0, n).select(
      concat(lit("g"), ($"id" % 7).cast("string")).as("d1"),
      ($"id" % 3).cast("int").as("d2"),
      ($"id" % 1000).cast("double").as("x"),
      when($"id" % 11 === 0, lit(null).cast("double"))
        .otherwise(($"id" % 97).cast("double")).as("y"),
      ($"id" % 13).cast("long").as("z"))

  private def sameRows(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what diverged")

  private def scannedRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  private def finals(partials: DataFrame, dims: Seq[String]): DataFrame = {
    import graft.functions.Fns.decDouble
    partials.select(
      (dims.map(col) ++ Seq(
        decDouble($"sum_x").as("sum_x"), $"cnt_x",
        $"min_x", $"max_x",
        decDouble($"sum_y").as("sum_y"), $"cnt_y",
        $"n_rows")): _*)
  }

  private def direct(df: DataFrame, dims: Seq[String]): DataFrame = {
    import graft.functions.Fns._
    val aggs = Seq(
      dsum($"x").as("sum_x"), count($"x").as("cnt_x"),
      min($"x").as("min_x"), max($"x").as("max_x"),
      dsum($"y").as("sum_y"), count($"y").as("cnt_y"),
      count(lit(1)).as("n_rows"))
    if (dims.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  test("summarize + rollup serve any dim subset exactly (incl. global)") {
    val df = baseData(10000)
    val partials = Summary.summarize(df, Seq("d1", "d2"), Seq("x", "y"))
    for (dims <- Seq(Seq("d1", "d2"), Seq("d1"), Seq("d2"), Seq.empty)) {
      val served = finals(Summary.rollup(partials, dims, Seq("x", "y")), dims)
      sameRows(served, direct(df, dims), s"rollup to $dims")
    }
  }

  test("refreshSummary: append is delta-sized, equals full rebuild") {
    val df = baseData(8000)
    graft.Tables.writeTable(df.repartition(4), "sumspec_base")
    Summary.writeSummary(spark.table("sumspec_base"), "sumspec_sum",
      Seq("d1", "d2"), Seq("x", "y"))
    // two appends, each landing new files
    Layout.appendPlain(baseData(9000).filter($"z" === 5).repartition(2),
      "sumspec_base")
    Layout.appendPlain(baseData(9500).filter($"z" === 6).repartition(1),
      "sumspec_base")
    val read = Summary.refreshSummary(spark, spark.table("sumspec_base"),
      "sumspec_sum")
    assert(read === 3L, s"refresh should read exactly the 3 delta files, read $read")
    val full = Summary.summarize(spark.table("sumspec_base"),
      Seq("d1", "d2"), Seq("x", "y"))
    sameRows(finals(spark.table("sumspec_sum"), Seq("d1", "d2")),
      finals(full, Seq("d1", "d2")), "incremental vs full rebuild")
    // no-op refresh reads nothing
    assert(Summary.refreshSummary(spark, spark.table("sumspec_base"),
      "sumspec_sum") === 0L)
  }

  test("refreshSummary: removed files force a sound full rebuild") {
    val df = baseData(6000)
    graft.Tables.writeTable(df.repartition(3), "sumspec_rm_base")
    Summary.writeSummary(spark.table("sumspec_rm_base"), "sumspec_rm_sum",
      Seq("d1"), Seq("x"))
    // replace the table contents wholesale (all old files removed)
    graft.Tables.writeTable(baseData(4000).repartition(2), "sumspec_rm_base")
    val read = Summary.refreshSummary(spark, spark.table("sumspec_rm_base"),
      "sumspec_rm_sum")
    assert(read === 2L, s"rebuild should read the 2 current files, read $read")
    val full = Summary.summarize(spark.table("sumspec_rm_base"),
      Seq("d1"), Seq("x"))
    sameRows(spark.table("sumspec_rm_sum").select($"d1", $"cnt_x", $"n_rows"),
      full.select($"d1", $"cnt_x", $"n_rows"), "post-removal rebuild")
  }

  // ----------------------------------------------------------- rewrite

  private def withRule[A](body: => A): A = {
    val had = spark.experimental.extraOptimizations
      .contains(graft.plans.SummaryRewrite)
    if (!had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.SummaryRewrite
    try body
    finally if (!had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.SummaryRewrite)
  }

  private def rwSetup(): Unit =
    if (!spark.catalog.tableExists("sumspec_rw_sum")) {
      graft.Tables.writeTable(baseData(12000).repartition(4),
        "sumspec_rw_base")
      Summary.writeSummary(spark.table("sumspec_rw_base"), "sumspec_rw_sum",
        Seq("d1", "d2"), Seq("x", "y", "z"))
      spark.table("sumspec_rw_base").createOrReplaceTempView("sumspec_rw_v")
    }

  private val rwSql =
    """SELECT d1,
      |  count(*) AS n,
      |  count(y) AS n_y,
      |  min(x) AS min_x,
      |  max(x) AS max_x,
      |  cast(cast(sum(cast(x AS decimal(18,4))) AS string) AS double) AS sum_x,
      |  sum(z) AS sum_z,
      |  cast(cast(sum(cast(x AS decimal(18,4))) AS string) AS double)
      |    / count(x) AS avg_x
      |FROM sumspec_rw_v
      |WHERE d2 <> 1
      |GROUP BY d1
      |ORDER BY d1""".stripMargin

  test("rewrite: filtered subset-group query served from the summary, bit-identical") {
    rwSetup()
    val baseline = spark.sql(rwSql).collect() // no rule, no registration
    Summary.register(spark.table("sumspec_rw_base"), "sumspec_rw_sum")
    withRule {
      val df = spark.sql(rwSql)
      val roots = scannedRoots(df)
      assert(roots.exists(_.contains("sumspec_rw_sum")),
        s"plan does not scan the summary:\n${df.queryExecution.optimizedPlan}")
      assert(!roots.exists(_.contains("sumspec_rw_base")),
        "plan still scans the base table")
      assert(df.collect().toSeq === baseline.toSeq)
    }
  }

  test("rewrite serves AVG: integral derivation and decimal division bit-identical") {
    rwSetup()
    // integral avg (z: long) — base sums doubles; served = exact
    // decimal total → double once / exact count. Decimal-cast avg —
    // served rebuilds Average's own DecimalDivideWithOverflowCheck
    // tree over the partials, so the (22,8) rounding is identical.
    val q = """SELECT d1,
              |  avg(z) AS avg_z,
              |  avg(cast(x AS decimal(18,4))) AS avg_x
              |FROM sumspec_rw_v
              |WHERE d2 <> 1
              |GROUP BY d1
              |ORDER BY d1""".stripMargin
    val baseline = spark.sql(q).collect() // no rule, no registration
    Summary.register(spark.table("sumspec_rw_base"), "sumspec_rw_sum")
    withRule {
      val df = spark.sql(q)
      val roots = scannedRoots(df)
      assert(roots.exists(_.contains("sumspec_rw_sum")) &&
        !roots.exists(_.contains("sumspec_rw_base")),
        s"AVG was not served:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().toSeq === baseline.toSeq)
      // raw-double avg still declines (fp partials don't exist)
      val dbl = spark.sql(
        "SELECT d1, avg(x) AS a FROM sumspec_rw_v GROUP BY d1")
      assert(scannedRoots(dbl).exists(_.contains("sumspec_rw_base")))
    }
  }

  test("rearm: a restarted driver re-arms the rewrite from on-disk assets alone") {
    rwSetup()
    Summary.register(spark.table("sumspec_rw_base"), "sumspec_rw_sum")
    val q = "SELECT d1, count(*) AS n FROM sumspec_rw_v GROUP BY d1 ORDER BY d1"
    withRule {
      assert(scannedRoots(spark.sql(q)).exists(_.contains("sumspec_rw_sum")))
      val expect = spark.sql(q).collect()
      // driver restart: the ConcurrentHashMap is gone, warehouse stays
      Summary.clearRegistry()
      assert(scannedRoots(spark.sql(q)).exists(_.contains("sumspec_rw_base")),
        "cleared registry must serve nothing")
      // the new driver re-arms by table name only — no base scan, no
      // caller-side dims/measures restatement
      Summary.rearm(spark, "sumspec_rw_sum")
      val df = spark.sql(q)
      assert(scannedRoots(df).exists(_.contains("sumspec_rw_sum")),
        s"rearm did not re-arm the rewrite:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().toSeq === expect.toSeq)
    }
  }

  test("rearm upgrade: a pre-r11 _meta (no base_roots) backfills from the base scan") {
    rwSetup()
    // simulate the old on-disk format: rewrite _meta WITHOUT base_roots
    // (same dims/measures the asset was built with — rwSetup's)
    val (dims, measures) = (Seq("d1", "d2"), Seq("x", "y", "z"))
    graft.Tables.writeTable(
      Seq((dims, measures)).toDF("dims", "measures"), "sumspec_rw_sum_meta")
    Summary.clearRegistry()
    // name-only rearm must fail fast (loud, documented)
    val ex = intercept[IllegalArgumentException] {
      Summary.rearm(spark, "sumspec_rw_sum")
    }
    assert(ex.getMessage.contains("base_roots"))
    // the upgrade overload backfills roots from the base scan in place
    Summary.rearm(spark, "sumspec_rw_sum", spark.table("sumspec_rw_base"))
    val q = "SELECT d1, count(*) AS n FROM sumspec_rw_v GROUP BY d1 ORDER BY d1"
    withRule {
      val df = spark.sql(q)
      assert(scannedRoots(df).exists(_.contains("sumspec_rw_sum")),
        s"upgraded rearm did not arm the rewrite:\n${df.queryExecution.optimizedPlan}")
    }
    // the asset is now current-format: name-only rearm works from here on
    Summary.clearRegistry()
    Summary.rearm(spark, "sumspec_rw_sum")
    withRule {
      assert(scannedRoots(spark.sql(q)).exists(_.contains("sumspec_rw_sum")))
    }
  }

  test("register's freshness token is the COVERED file set — registering against a grown base declines") {
    graft.Tables.writeTable(baseData(4000).repartition(2), "sumspec_gr_base")
    Summary.writeSummary(spark.table("sumspec_gr_base"), "sumspec_gr_sum",
      Seq("d1"), Seq("x"))
    // base grows AFTER the summary build, BEFORE registration — the
    // old current-listing token would pass freshness here and serve
    // stale partials silently
    Layout.appendPlain(baseData(4400).filter($"z" === 3).repartition(1),
      "sumspec_gr_base")
    Summary.register(spark.table("sumspec_gr_base"), "sumspec_gr_sum")
    spark.table("sumspec_gr_base").createOrReplaceTempView("sumspec_gr_v")
    val q = "SELECT d1, count(*) AS n FROM sumspec_gr_v GROUP BY d1 ORDER BY d1"
    withRule {
      val df = spark.sql(q)
      assert(scannedRoots(df).exists(_.contains("sumspec_gr_base")),
        "must decline: the summary does not cover the appended files")
      val expect = spark.table("sumspec_gr_base").groupBy($"d1")
        .agg(count(lit(1)).as("n")).orderBy($"d1").collect()
      assert(df.collect().toSeq === expect.toSeq)
    }
  }

  test("rewrite declines what the partials cannot answer exactly") {
    rwSetup()
    Summary.register(spark.table("sumspec_rw_base"), "sumspec_rw_sum")
    val declined = Seq(
      // raw double sum: re-merged fp addition would not be bit-identical
      "SELECT d1, sum(x) AS s FROM sumspec_rw_v GROUP BY d1",
      // raw-double avg: the fp sum partial it needs is never stored
      "SELECT d1, avg(x) AS a FROM sumspec_rw_v GROUP BY d1",
      // distinct aggregate
      "SELECT d1, count(DISTINCT x) AS c FROM sumspec_rw_v GROUP BY d1",
      // filter on a measure column
      "SELECT d1, count(*) AS c FROM sumspec_rw_v WHERE x > 10 GROUP BY d1",
      // grouping on a non-dim column
      "SELECT z, count(*) AS c FROM sumspec_rw_v GROUP BY z")
    withRule {
      declined.foreach { q =>
        val roots = scannedRoots(spark.sql(q))
        assert(roots.exists(_.contains("sumspec_rw_base")) &&
          !roots.exists(_.contains("sumspec_rw_sum")),
          s"should have declined: $q")
      }
    }
  }

  test("rewrite: empty filter selection keeps global-aggregate semantics") {
    rwSetup()
    Summary.register(spark.table("sumspec_rw_base"), "sumspec_rw_sum")
    val q = """SELECT count(*) AS n, sum(z) AS s, min(x) AS m
              |FROM sumspec_rw_v WHERE d1 = 'nope'""".stripMargin
    val baseline = spark.sql(q).collect()
    withRule {
      val df = spark.sql(q)
      assert(scannedRoots(df).exists(_.contains("sumspec_rw_sum")))
      assert(df.collect().toSeq === baseline.toSeq) // one row: (0, null, null)
    }
  }

  test("rewrite: HAVING and ORDER BY over rewritten aggregates keep exprId wiring") {
    rwSetup()
    Summary.register(spark.table("sumspec_rw_base"), "sumspec_rw_sum")
    // the parent Filter/Sort reference the Aggregate's output
    // attributes — a rewrite that broke exprId preservation would
    // fail analysis or bind to the wrong column here
    val q = """SELECT d1, count(*) AS n,
              |  cast(cast(sum(cast(x AS decimal(18,4))) AS string) AS double) AS sx
              |FROM sumspec_rw_v
              |GROUP BY d1
              |HAVING count(*) > 100 AND min(x) >= 0
              |ORDER BY n DESC, d1""".stripMargin
    val baseline = spark.sql(q).collect()
    withRule {
      val df = spark.sql(q)
      assert(scannedRoots(df).exists(_.contains("sumspec_rw_sum")))
      assert(df.collect().toSeq === baseline.toSeq)
    }
  }

  test("summary over a PARTITIONED base: partition appends refresh delta-sized") {
    def mk(lo: Long, hi: Long) = spark.range(lo, hi).select(
      ($"id" % 4).cast("string").as("p"),
      ($"id" % 6).cast("string").as("g"),
      ($"id" % 50).cast("double").as("x"))
    graft.Tables.writePartitioned(mk(0, 2000), "sumspec_pt_base", Seq("p"))
    Summary.writeSummary(spark.table("sumspec_pt_base"), "sumspec_pt_sum",
      Seq("g"), Seq("x"))
    // append lands inside partition directories; the files diff sees
    // the new leaf files regardless of directory layout
    val before = spark.table("sumspec_pt_base").inputFiles.length
    mk(2000, 2600).write.mode("append").format("parquet")
      .partitionBy("p").saveAsTable("sumspec_pt_base")
    val delta = spark.table("sumspec_pt_base").inputFiles.length - before
    val read = Summary.refreshSummary(spark,
      spark.table("sumspec_pt_base"), "sumspec_pt_sum")
    assert(read === delta.toLong && delta > 0,
      s"refresh should read exactly the $delta appended leaf files, read $read")
    val full = Summary.summarize(spark.table("sumspec_pt_base"),
      Seq("g"), Seq("x"))
    sameRows(
      spark.table("sumspec_pt_sum").select($"g", $"cnt_x", $"n_rows"),
      full.select($"g", $"cnt_x", $"n_rows"),
      "partitioned-base incremental refresh")
    spark.sql("DROP TABLE IF EXISTS sumspec_pt_base")
  }

  test("rewrite navigation: coarsest covering summary wins; finer one serves what it can't") {
    graft.Tables.writeTable(baseData(7000).repartition(2), "sumspec_nav_base")
    val base = spark.table("sumspec_nav_base")
    // fine grain: (d1, d2); coarse grain: (d1) — same measures
    Summary.writeSummary(base, "sumspec_nav_fine", Seq("d1", "d2"), Seq("x"))
    Summary.writeSummary(base, "sumspec_nav_coarse", Seq("d1"), Seq("x"))
    Summary.register(base, "sumspec_nav_fine")
    Summary.register(base, "sumspec_nav_coarse")
    base.createOrReplaceTempView("sumspec_nav_v")
    withRule {
      // a d1-only query is served by the COARSE summary (7 rows),
      // not the fine one it also matches
      val q1 = spark.sql(
        "SELECT d1, count(*) AS n FROM sumspec_nav_v GROUP BY d1 ORDER BY d1")
      val r1 = scannedRoots(q1)
      assert(r1.exists(_.contains("sumspec_nav_coarse")) &&
        !r1.exists(_.contains("sumspec_nav_fine")), s"wrong candidate: $r1")
      // a query grouping on d2 cannot use the coarse one — navigation
      // falls through to the fine summary
      val q2 = spark.sql(
        "SELECT d2, count(*) AS n FROM sumspec_nav_v GROUP BY d2 ORDER BY d2")
      val r2 = scannedRoots(q2)
      assert(r2.exists(_.contains("sumspec_nav_fine")) &&
        !r2.exists(_.contains("sumspec_nav_coarse")), s"no fallthrough: $r2")
      // both serve the right numbers
      val expect1 = base.groupBy($"d1").agg(count(lit(1)).as("n"))
        .orderBy($"d1").collect()
      val expect2 = base.groupBy($"d2").agg(count(lit(1)).as("n"))
        .orderBy($"d2").collect()
      assert(q1.collect().toSeq === expect1.toSeq)
      assert(q2.collect().toSeq === expect2.toSeq)
    }
  }

  test("rewrite: a registry entry whose table was dropped declines instead of failing the query") {
    graft.Tables.writeTable(baseData(3000).repartition(2), "sumspec_dr_base")
    Summary.writeSummary(spark.table("sumspec_dr_base"), "sumspec_dr_sum",
      Seq("d1"), Seq("x"))
    Summary.register(spark.table("sumspec_dr_base"), "sumspec_dr_sum")
    spark.table("sumspec_dr_base").createOrReplaceTempView("sumspec_dr_v")
    val q = "SELECT d1, count(*) AS n FROM sumspec_dr_v GROUP BY d1 ORDER BY d1"
    withRule {
      assert(scannedRoots(spark.sql(q)).exists(_.contains("sumspec_dr_sum")))
      // the asset disappears but the registration lingers — an
      // optimizer rule must never turn that into a query failure
      spark.sql("DROP TABLE sumspec_dr_sum")
      val df = spark.sql(q)
      assert(scannedRoots(df).exists(_.contains("sumspec_dr_base")))
      val expect = spark.table("sumspec_dr_base").groupBy($"d1")
        .agg(count(lit(1)).as("n")).orderBy($"d1").collect()
      assert(df.collect().toSeq === expect.toSeq)
    }
  }

  test("rewrite: stale summary declines; refresh + re-register re-arms") {
    graft.Tables.writeTable(baseData(5000).repartition(2), "sumspec_st_base")
    Summary.writeSummary(spark.table("sumspec_st_base"), "sumspec_st_sum",
      Seq("d1"), Seq("x"))
    Summary.register(spark.table("sumspec_st_base"), "sumspec_st_sum")
    spark.table("sumspec_st_base").createOrReplaceTempView("sumspec_st_v")
    val q = "SELECT d1, count(*) AS n FROM sumspec_st_v GROUP BY d1 ORDER BY d1"
    withRule {
      assert(scannedRoots(spark.sql(q)).exists(_.contains("sumspec_st_sum")))
      // base grows: the registered file set no longer matches -> decline
      Layout.appendPlain(baseData(5500).filter($"z" === 2).repartition(1),
        "sumspec_st_base")
      spark.table("sumspec_st_base").createOrReplaceTempView("sumspec_st_v")
      val stale = spark.sql(q)
      assert(scannedRoots(stale).exists(_.contains("sumspec_st_base")),
        "stale summary must fall back to the base scan")
      val expect = spark.table("sumspec_st_base").groupBy($"d1")
        .agg(count(lit(1)).as("n")).orderBy($"d1").collect()
      assert(stale.collect().toSeq === expect.toSeq)
      // refresh + re-register re-arms the rewrite, now serving the grown base
      Summary.refreshSummary(spark, spark.table("sumspec_st_base"),
        "sumspec_st_sum")
      Summary.register(spark.table("sumspec_st_base"), "sumspec_st_sum")
      val fresh = spark.sql(q)
      assert(scannedRoots(fresh).exists(_.contains("sumspec_st_sum")))
      assert(fresh.collect().toSeq === expect.toSeq)
    }
  }
}
