package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (Morton): hand-checked small cases") {
    // x=0b11, y=0b01, bits=2, d=2 with x at even positions, y at odd:
    // z = x0 + y0<<1 + x1<<2 + y1<<3 = 1 + 2 + 4 + 0 = 7
    val df = Seq((3L, 1L)).toDF("x", "y")
    val z = df.select(
      Layout.zValue(Seq(col("x"), col("y")), bits = 2).as("z")).head().getLong(0)
    assert(z === 7L)
    // identity checks: a single column interleaves to itself
    val one = Seq((13L)).toDF("x")
      .select(Layout.zValue(Seq(col("x")), bits = 6).as("z")).head().getLong(0)
    assert(one === 13L)
  }

  test("withRankBuckets maps min->0, max->top bucket, all in range") {
    val df = spark.range(0, 1000).select(($"id" * 3 + 7).as("v"))
    val b = Layout.withRankBuckets(df.toDF(), Seq("v"), bits = 4)
    val stats = b.agg(
      min(col("_b_v")).as("mn"), max(col("_b_v")).as("mx"),
      count(when(col("_b_v") < 0 || col("_b_v") > 15, 1)).as("oob")).head()
    assert(stats.getAs[Long]("mn") === 0L)
    assert(stats.getAs[Long]("mx") === 15L)
    assert(stats.getAs[Long]("oob") === 0L)
  }

  test("equi-depth buckets stay balanced under quadratic skew; linear collapse") {
    // id^2: half the rows sit in the lowest quarter of the value range
    val df = spark.range(0, 4096).select(($"id" * $"id").as("v"))
    val linear = Layout.withRankBuckets(df.toDF(), Seq("v"), bits = 4)
      .groupBy("_b_v").count().agg(max("count")).head().getLong(0)
    val eq = Layout.withRankBucketsEquiDepth(df.toDF(), Seq("v"), bits = 4)
      .groupBy("_b_v").count().agg(max("count")).head().getLong(0)
    val mean = 4096.0 / 16
    // linear min/max scaling dumps most rows into the low buckets
    assert(linear >= 4 * mean, s"expected linear skew, max bucket $linear")
    // quantile boundaries keep every bucket near the mean
    assert(eq < 2 * mean, s"equi-depth failed to balance: max bucket $eq")
    // both forms cover the full bucket range and stay in bounds
    val r = Layout.withRankBucketsEquiDepth(df.toDF(), Seq("v"), bits = 4)
      .agg(min("_b_v"), max("_b_v")).head()
    assert(r.getLong(0) === 0L && r.getLong(1) === 15L)
  }

  /** Total rows emitted by the scan leaves of the EXECUTED plan —
    * after parquet row-group skipping, so it measures what the layout
    * saved (not what the filter discarded post-read).
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    graft.tools.PlanWalk.scanOutputRows(df)
  }

  test("z-layout prunes row groups for BOTH clustered columns; single-sort only one") {
    // x uniform; y must be genuinely independent of x — a linear
    // stride like (id*7919)%256 is a FUNCTION of id%256 = x and the
    // x-sorted baseline would accidentally prune on it. Hash instead.
    val n = 40000L
    val data = spark.range(0, n).select(
      ($"id" % 256).as("x"),
      pmod(xxhash64($"id"), lit(256L)).as("y"),
      ($"id" * 2).as("payload"))
    Layout.writeZOrdered(data.toDF(), "layoutspec_z", Seq("x", "y"),
      bits = 8, nRanges = 32)
    // baseline: clustered on x alone (same file count, same sort cost)
    graft.Tables.writeTable(
      data.repartitionByRange(32, col("x")).sortWithinPartitions("x"),
      "layoutspec_xsort")

    val zTbl = spark.table("layoutspec_z")
    val xTbl = spark.table("layoutspec_xsort")
    val yProbe = col("y").between(0, 15)   // 1/16 of the y domain
    val xProbe = col("x").between(0, 15)   // 1/16 of the x domain

    // correctness first: identical results from both layouts
    val zCnt = zTbl.filter(yProbe).count()
    assert(zCnt === xTbl.filter(yProbe).count())

    // the x-sorted layout cannot prune on y: every file spans the
    // whole y domain, the scan reads ~everything
    val xSortYRows = scanRows(xTbl.filter(yProbe).select(sum("payload")))
    assert(xSortYRows > (n * 0.9).toLong,
      s"x-sorted layout unexpectedly pruned on y: $xSortYRows of $n")
    // the z-layout bounds y per curve chunk: reads a fraction
    val zYRows = scanRows(zTbl.filter(yProbe).select(sum("payload")))
    assert(zYRows < n / 2,
      s"z-layout failed to prune on y: $zYRows of $n")
    // ...and still prunes on x too
    val zXRows = scanRows(zTbl.filter(xProbe).select(sum("payload")))
    assert(zXRows < n / 2,
      s"z-layout failed to prune on x: $zXRows of $n")
  }
}
