package graft

import org.apache.spark.sql.functions._

/** Asset-table write safety: the stage-then-swap contract (ADVICE r5)
  * — a failed replacement write must leave the previous version
  * registered and readable, and a successful one must atomically-ish
  * swap while keeping the bucket spec.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}

  test("writeBucketed: failed replacement write preserves the previous table") {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Tables.writeBucketed(v1, "tables_spec_swap", Seq("k"), 2)
    assert(spark.table("tables_spec_swap").count() === 2L)
    // a df that fails AT EXECUTION (raise_error fires on the data),
    // after the old table was already in place
    val bad = Seq((3L, "c")).toDF("k", "v")
      .withColumn("v", when(col("k") > 0L,
        raise_error(lit("boom"))).otherwise(col("v")))
    intercept[Exception] {
      Tables.writeBucketed(bad, "tables_spec_swap", Seq("k"), 2)
    }
    // the previous version survives, still 2 rows, still bucketed
    val back = spark.table("tables_spec_swap")
    assert(back.count() === 2L)
    assert(back.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    assert(spark.sql("DESCRIBE TABLE EXTENDED tables_spec_swap")
      .filter(col("col_name") === "Num Buckets").count() === 1L)
    // and a subsequent good write still replaces cleanly
    val v2 = Seq((7L, "z")).toDF("k", "v")
    Tables.writeBucketed(v2, "tables_spec_swap", Seq("k"), 2)
    assert(spark.table("tables_spec_swap").as[(Long, String)]
      .collect().toSet === Set((7L, "z")))
    spark.sql("DROP TABLE IF EXISTS tables_spec_swap")
  }

  test("stageAndSwap recovers a dangling complete stage (crash between drop and rename)") {
    // ADVICE r6: the drop→rename window is not atomic. Simulate a
    // writer that crashed inside it — the staged table is complete
    // and registered, the target is gone — and assert the NEXT build
    // (a) does not fail on the leftover stage, (b) leaves the final
    // content of the new write, (c) leaves no stage behind.
    val v1 = Seq((1L, "a")).toDF("k", "v")
    Tables.writeTable(v1, "tables_spec_rec")
    Seq((2L, "b")).toDF("k", "v").write.mode("overwrite")
      .format("parquet").saveAsTable("tables_spec_rec__stage")
    spark.sql("DROP TABLE tables_spec_rec") // the crash window
    val v3 = Seq((3L, "c")).toDF("k", "v")
    Tables.writeTable(v3, "tables_spec_rec")
    assert(spark.table("tables_spec_rec").as[(Long, String)]
      .collect().toSet === Set((3L, "c")))
    assert(!spark.catalog.tableExists("tables_spec_rec__stage"))
    spark.sql("DROP TABLE IF EXISTS tables_spec_rec")
  }

  test("asset table names must be unqualified (the quoting contract)") {
    val v = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Tables.writeTable(v, "somedb.tables_spec_q")
    }
    assert(e.getMessage.contains("unqualified"))
  }

  test("writeTable: failed replacement preserves the previous 1-row asset") {
    val v1 = Seq((10L, 20L)).toDF("a", "b")
    Tables.writeTable(v1, "tables_spec_plain")
    val bad = Seq((1L, 2L)).toDF("a", "b")
      .withColumn("b", when(col("a") > 0L,
        raise_error(lit("boom")).cast("long")).otherwise(col("b")))
    intercept[Exception] {
      Tables.writeTable(bad, "tables_spec_plain")
    }
    assert(spark.table("tables_spec_plain").as[(Long, Long)]
      .collect().toSeq === Seq((10L, 20L)))
    spark.sql("DROP TABLE IF EXISTS tables_spec_plain")
  }

  test("writePartitioned: partitions live after the swap, pruned reads, rewrite survives") {
    def mk(n: Long) = spark.range(0, n).select(
      $"id".as("v"), ($"id" % 5).cast("string").as("p"))
    Tables.writePartitioned(mk(1000), "tables_spec_part", Seq("p"))
    // the rename-swap must leave LIVE partition metadata (the repair
    // path): all rows readable, partition listing populated
    assert(spark.table("tables_spec_part").count() === 1000L)
    assert(spark.sql("SHOW PARTITIONS tables_spec_part").count() === 5L)
    // a partition filter reaches the scan as a partitionFilter
    val df = spark.table("tables_spec_part").filter($"p" === "3")
    val scans = graft.tools.PlanWalk
      .allNodes(df.queryExecution.executedPlan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty))
    assert(df.count() === 200L)
    // a REWRITE of the same table goes through the same swap + repair
    Tables.writePartitioned(mk(500), "tables_spec_part", Seq("p"))
    assert(spark.table("tables_spec_part").count() === 500L)
    spark.sql("DROP TABLE IF EXISTS tables_spec_part")
  }
}
