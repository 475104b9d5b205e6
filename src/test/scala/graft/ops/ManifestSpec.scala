package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ManifestSpec extends SparkSpec {
  import spark.implicits._

  test("fileStats: one row per file, correct count and min/max") {
    val data = spark.range(0, 1000).select($"id".as("v"))
      .repartitionByRange(4, $"v").sortWithinPartitions("v")
    graft.Tables.writeTable(data, "manspec_base")
    val stats = Manifest.fileStats(spark.table("manspec_base"), Seq("v"))
      .collect()
    assert(stats.length === 4)
    assert(stats.map(_.getAs[Long]("n_rows")).sum === 1000L)
    // files are range-partitioned: min/max intervals are disjoint and
    // together cover 0..999
    val ivs = stats.map(r => (r.getAs[Long]("min_v"), r.getAs[Long]("max_v")))
      .sortBy(_._1)
    assert(ivs.head._1 === 0L && ivs.last._2 === 999L)
    ivs.sliding(2).foreach { case Array((_, aMax), (bMin, _)) =>
      assert(aMax < bMin, s"file intervals overlap: $aMax >= $bMin")
    }
  }

  test("prunedRead equals the full filter, prunes the file list") {
    val n = 20000L
    val data = spark.range(0, n).select(
      ($"id" % 128).as("x"),
      pmod(xxhash64($"id"), lit(128L)).as("y"),
      $"id".as("payload"))
    Layout.writeZOrdered(data.toDF(), "manspec_z", Seq("x", "y"),
      bits = 7, nRanges = 16)
    Manifest.writeManifest(spark.table("manspec_z"), "manspec_stats",
      Seq("x", "y"))
    val z = spark.table("manspec_z")
    for ((c, lo, hi) <- Seq(("x", 0L, 15L), ("y", 0L, 15L),
      ("x", 100L, 127L), ("y", 64L, 71L))) {
      val pruned = Manifest.prunedRead(spark, z, "manspec_stats",
        c, lit(lo), lit(hi)).select($"x", $"y", $"payload")
      val full = z.filter(col(c) >= lo && col(c) <= hi)
        .select($"x", $"y", $"payload")
      assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty,
        s"pruned read diverged on $c in [$lo,$hi]")
      // planning-time effectiveness: a 1/8-domain probe on a z-layout
      // must not select every file
      val files = Manifest.prunedFiles(spark, "manspec_stats", c,
        lit(lo), lit(hi))
      assert(files.nonEmpty && files.size < 16,
        s"no file-level pruning for $c in [$lo,$hi]: ${files.size} of 16")
    }
  }

  test("empty selection: out-of-domain range returns zero rows with schema") {
    val out = Manifest.prunedRead(spark, spark.table("manspec_z"),
      "manspec_stats", "x", lit(5000L), lit(6000L))
    assert(out.columns.toSeq === Seq("x", "y", "payload"))
    assert(out.count() === 0L)
  }

  test("null stats are sound: all-null files are prunable, nulls never match") {
    val data = spark.range(0, 400).select(
      when($"id" < 200, $"id").otherwise(lit(null)).as("v"),
      $"id".as("payload"))
      .repartitionByRange(2, $"payload")
    graft.Tables.writeTable(data, "manspec_nulls")
    Manifest.writeManifest(spark.table("manspec_nulls"), "manspec_nulls_stats",
      Seq("v"))
    val t = spark.table("manspec_nulls")
    val pruned = Manifest.prunedRead(spark, t, "manspec_nulls_stats",
      "v", lit(0L), lit(399L)).select($"payload")
    val full = t.filter($"v" >= 0L && $"v" <= 399L).select($"payload")
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    assert(pruned.count() === 200L)
  }
}
