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

  test("equi-depth binary search equals the HOF executable spec") {
    // values with heavy duplication (ties at boundaries), a skewed
    // tail, and nulls — the cases a binary-search rewrite could get
    // wrong vs the count-the-boundaries spec
    for (bits <- Seq(1, 3, 8)) {
      val nb = 1 << bits
      val df = spark.range(0, 5000).select(
        when($"id" % 97 === 0, lit(null))
          .otherwise(($"id" % 50) * ($"id" % 50)).as("v"))
      val pcts = typedLit((1 until nb).map(_.toDouble / nb))
      val stats = df.agg(
        percentile_approx($"v".cast("double"), pcts, lit(10000)).as("_bnd_v"))
      val both = df.crossJoin(broadcast(stats)).select(
        Layout.equiDepthBucketSpec($"v", $"_bnd_v").as("spec"),
        $"v", $"_bnd_v")
      // spec on non-null rows must equal the fast form's bucket col
      val fast = Layout.withRankBucketsEquiDepth(df.toDF(), Seq("v"), bits)
      val specMap = both.filter($"v".isNotNull)
        .select($"v", $"spec").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val fastMap = fast.filter($"v".isNotNull)
        .select($"v", $"_b_v").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(fastMap === specMap,
        s"binary search diverged from the HOF spec at bits=$bits")
      // nulls: bucket 0 in the fast form (spec yields 0 too — a null
      // comparison filters every boundary out)
      assert(fast.filter($"v".isNull && $"_b_v" =!= 0L).count() === 0L)
    }
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

  test("compactLayout: delta-sized re-cluster restores pruning, results invariant") {
    val n = 40000L
    def gen(lo: Long, hi: Long) = spark.range(lo, hi).select(
      ($"id" % 256).as("x"),
      pmod(xxhash64($"id"), lit(256L)).as("y"),
      ($"id" * 2).as("payload"))
    // base 75% clustered, then two plain appends of ~12.5% each
    Layout.writeZOrdered(gen(0, 30000).toDF(), "layoutspec_c", Seq("x", "y"),
      bits = 8, nRanges = 24)
    Layout.appendPlain(gen(30000, 35000).toDF(), "layoutspec_c")
    Layout.appendPlain(gen(35000, 40000).toDF(), "layoutspec_c")
    val t = spark.table("layoutspec_c")
    assert(t.count() === n)

    val yProbe = col("y").between(0, 15) // 1/16 of the y domain
    val expect = gen(0, n).filter(yProbe).agg(sum("payload")).head().getLong(0)
    // deltas are un-clustered: they span the whole y domain, so the
    // probe reads every delta row on top of the pruned base
    val before = scanRows(t.filter(yProbe).select(sum("payload")))
    assert(before > 10000L,
      s"expected the un-clustered deltas to defeat pruning: $before")

    // compact: only the ~10k delta rows are rewritten
    val deltaFiles = t.inputFiles.length -
      spark.table(Layout.registryTable("layoutspec_c")).count().toInt
    val compacted = Layout.compactLayout(spark, "layoutspec_c",
      Seq("x", "y"), bits = 8, nRanges = 8)
    assert(compacted.toInt === deltaFiles && compacted > 0)

    val t2 = spark.table("layoutspec_c")
    assert(t2.count() === n, "compaction must not lose or duplicate rows")
    assert(t2.filter(yProbe).agg(sum("payload")).head().getLong(0) === expect)
    // pruning restored: before compaction EVERY delta row is read (an
    // un-clustered file spans the whole y domain); after, the delta's
    // own z-ranges bound y per file. With 8 delta ranges a 2-D curve
    // pins ~2 of y's top bits per chunk, so expect at least half the
    // 10k delta rows pruned (the base's fraction is unchanged).
    val after = scanRows(t2.filter(yProbe).select(sum("payload")))
    assert(after <= before - 5000L,
      s"compaction failed to restore pruning: $after vs $before before")
    // idempotent: nothing left to compact
    assert(Layout.compactLayout(spark, "layoutspec_c",
      Seq("x", "y"), bits = 8, nRanges = 8) === 0L)
  }

  test("compactLayout journal replay completes a crashed swap") {
    def gen(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(($"id" % 16).as("x"), ($"id" % 64).as("y"), $"id".as("payload"))
    Layout.writeZOrdered(gen(0, 2000).toDF(), "layoutspec_j", Seq("x", "y"),
      bits = 4, nRanges = 4)
    Layout.appendPlain(gen(2000, 3000).toDF(), "layoutspec_j")
    val total = spark.table("layoutspec_j").agg(sum("payload")).head().getLong(0)

    // simulate the crash window: stage the compacted replacement and
    // publish the journal, but die before any move/delete runs
    val ident = org.apache.spark.sql.catalyst.TableIdentifier("layoutspec_j")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(ident).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reg = spark.table(Layout.registryTable("layoutspec_j"))
      .select($"file").as[String].collect().map(Manifest.norm).toSet
    val delta = spark.table("layoutspec_j").inputFiles.map(Manifest.norm)
      .filterNot(reg).sorted
    assert(delta.nonEmpty)
    val staging = new org.apache.hadoop.fs.Path(loc, "_compact_staged")
    spark.read.parquet(delta: _*).repartition(1)
      .write.mode("overwrite").parquet(staging.toString)
    val staged = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
    val out = fs.create(new org.apache.hadoop.fs.Path(loc, "_compact_journal"), true)
    try {
      val sb = new StringBuilder
      staged.foreach(p => sb.append(
        s"MV\t$p\t${new org.apache.hadoop.fs.Path(loc, p.getName)}\n"))
      delta.foreach(f => sb.append(s"RM\t$f\n"))
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()

    // next maintenance run replays the journal to completion first
    assert(Layout.compactLayout(spark, "layoutspec_j",
      Seq("x", "y"), bits = 4, nRanges = 4) === 0L)
    val t = spark.table("layoutspec_j")
    assert(t.agg(sum("payload")).head().getLong(0) === total,
      "replay must neither lose nor duplicate rows")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(loc, "_compact_journal")))
    assert(!fs.exists(staging))
    // delta files are gone, moved files are registered
    val reg2 = spark.table(Layout.registryTable("layoutspec_j"))
      .select($"file").as[String].collect().map(Manifest.norm).toSet
    assert(t.inputFiles.map(Manifest.norm).forall(reg2.contains),
      "every surviving file must be registered as clustered after replay")
    delta.foreach(f => assert(!fs.exists(new org.apache.hadoop.fs.Path(f))))
  }
}
