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

  test("conjunctive pruning: intersection selects fewer files than either column") {
    // manspec_z/manspec_stats built by the previous test (z-layout on x, y)
    val z = spark.table("manspec_z")
    val preds = Seq(("x", lit(0L), lit(15L)), ("y", lit(0L), lit(15L)))
    val pruned = Manifest.prunedRead(spark, z, "manspec_stats", preds)
      .select($"x", $"y", $"payload")
    val full = z.filter($"x".between(0, 15) && $"y".between(0, 15))
      .select($"x", $"y", $"payload")
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty,
      "conjunctive pruned read diverged from the full filter")
    // survival fractions multiply: the intersection beats both
    // single-column selections
    val both = Manifest.prunedFiles(spark, "manspec_stats", preds).size
    val xOnly = Manifest.prunedFiles(spark, "manspec_stats",
      "x", lit(0L), lit(15L)).size
    val yOnly = Manifest.prunedFiles(spark, "manspec_stats",
      "y", lit(0L), lit(15L)).size
    assert(both < math.min(xOnly, yOnly),
      s"conjunction must intersect: $both vs x=$xOnly y=$yOnly")
  }

  test("paths with spaces and percent signs resolve through norm (ADVICE r9)") {
    val base = java.nio.file.Files.createTempDirectory("manspec dir %20odd")
    val dir = base.toString
    spark.range(0, 1000).select($"id".as("v"))
      .repartitionByRange(4, $"v").write.mode("overwrite").parquet(dir)
    Manifest.writeManifest(spark.read.parquet(dir), "manspec_odd_stats",
      Seq("v"))
    // the stored keys are percent-ENCODED URIs; prunedFiles must hand
    // decoded paths to spark.read.parquet or the read mis-resolves
    val files = Manifest.prunedFiles(spark, "manspec_odd_stats",
      "v", lit(0L), lit(400L))
    assert(files.nonEmpty && files.size < 4)
    val pruned = Manifest.prunedRead(spark, spark.read.parquet(dir),
      "manspec_odd_stats", "v", lit(100L), lit(300L))
    assert(pruned.count() === 201L)
    // refresh round-trips the odd path too (diff must see 0 new files)
    assert(Manifest.refreshManifest(spark, spark.read.parquet(dir),
      "manspec_odd_stats", Seq("v")) === 0L)
    // and the bloom index path round-trips as well
    Manifest.writeFileBloom(spark.read.parquet(dir), col("v"),
      mBits = 1 << 12, k = 4, "manspec_odd_bloom")
    val viaBloom = Manifest.bloomPrunedRead(spark,
      spark.read.parquet(dir), "manspec_odd_bloom", "v",
      Seq(17L, 444L, 999L), 1 << 12, 4)
    assert(viaBloom.count() === 3L)
  }

  test("refreshManifest drops rows for files removed by compaction") {
    val dir = java.nio.file.Files.createTempDirectory("manspec_rm").toString
    spark.range(0, 800).select($"id".as("v"))
      .repartitionByRange(4, $"v").write.mode("overwrite").parquet(dir)
    Manifest.writeManifest(spark.read.parquet(dir), "manspec_rm_stats",
      Seq("v"))
    assert(spark.table("manspec_rm_stats").count() === 4L)
    // remove one file out from under the manifest (what compactLayout
    // does to delta files) and add another
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val victim = spark.read.parquet(dir).inputFiles.map(Manifest.norm).sorted.head
    fs.delete(new org.apache.hadoop.fs.Path(victim), false)
    spark.range(800, 1000).select($"id".as("v"))
      .repartition(1).write.mode("append").parquet(dir)
    assert(Manifest.refreshManifest(spark, spark.read.parquet(dir),
      "manspec_rm_stats", Seq("v")) === 1L)
    // manifest now mirrors the directory exactly: 4 files (3 old + 1 new)
    assert(spark.table("manspec_rm_stats").count() === 4L)
    val t = spark.read.parquet(dir)
    val pruned = Manifest.prunedRead(spark, t, "manspec_rm_stats",
      "v", lit(0L), lit(2000L))
    assert(pruned.count() === t.count())
  }

  test("empty selection: out-of-domain range returns zero rows with schema") {
    val out = Manifest.prunedRead(spark, spark.table("manspec_z"),
      "manspec_stats", "x", lit(5000L), lit(6000L))
    assert(out.columns.toSeq === Seq("x", "y", "payload"))
    assert(out.count() === 0L)
  }

  test("refreshManifest stats only new files; result equals a full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("manspec_incr").toString
    spark.range(0, 1000).select($"id".as("v"))
      .repartitionByRange(4, $"v").write.mode("overwrite").parquet(dir)
    Manifest.writeManifest(spark.read.parquet(dir), "manspec_incr_stats",
      Seq("v"))
    assert(spark.table("manspec_incr_stats").count() === 4L)
    // no-op refresh: nothing new, nothing scanned
    assert(Manifest.refreshManifest(spark, spark.read.parquet(dir),
      "manspec_incr_stats", Seq("v")) === 0L)
    // append two more files (the streaming-sink arrival shape)
    spark.range(1000, 1500).select($"id".as("v"))
      .repartitionByRange(2, $"v").write.mode("append").parquet(dir)
    assert(Manifest.refreshManifest(spark, spark.read.parquet(dir),
      "manspec_incr_stats", Seq("v")) === 2L)
    // incremental result == full rebuild (modulo path rendering)
    Manifest.writeManifest(spark.read.parquet(dir), "manspec_full_stats",
      Seq("v"))
    def rows(tbl: String) = spark.table(tbl)
      .select($"n_rows", $"min_v", $"max_v")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(rows("manspec_incr_stats").toSeq === rows("manspec_full_stats").toSeq)
    // and the refreshed manifest still serves correct pruned reads
    val t = spark.read.parquet(dir)
    val pruned = Manifest.prunedRead(spark, t, "manspec_incr_stats",
      "v", lit(1200L), lit(1300L))
    assert(pruned.count() === t.filter($"v".between(1200, 1300)).count())
  }

  test("fileBloom point lookup: parity with exact IN, prunes the file set") {
    val data = spark.range(0, 30000).select(
      ($"id" / 5).cast("long").as("key"),       // ~5 rows per key
      pmod(xxhash64($"id" * 7), lit(16L)).as("grp"),
      $"id".as("payload"))
    graft.Tables.writeTable(data.repartition(16, $"grp"), "manspec_bloom_t")
    Manifest.writeFileBloom(spark.table("manspec_bloom_t"), col("key"),
      mBits = 1 << 16, k = 4, "manspec_bloom_idx")
    val t = spark.table("manspec_bloom_t")
    val keys = Seq(12L, 777L, 3000L, 5999L)
    val viaBloom = Manifest.bloomPrunedRead(spark, t, "manspec_bloom_idx",
      "key", keys, 1 << 16, 4).select($"key", $"payload")
    val exact = t.filter($"key".isin(keys: _*)).select($"key", $"payload")
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty,
      "bloom-pruned lookup diverged from the exact IN filter")
    assert(viaBloom.count() === 20L) // 4 keys x 5 rows
    // each key's rows live in <= 5 files; 4 keys + fp must not open all 16
    val files = Manifest.bloomPrunedFiles(spark, "manspec_bloom_idx",
      keys, 1 << 16, 4)
    assert(files.nonEmpty && files.size < 16,
      s"bloom index failed to prune: ${files.size} of 16 files")
    // absent keys select nothing beyond false positives and return no rows
    val absent = Manifest.bloomPrunedRead(spark, t, "manspec_bloom_idx",
      "key", Seq(999999L), 1 << 16, 4)
    assert(absent.count() === 0L)
  }

  test("bloomPrunedFilesFor: in-plan probe set equals the literal-keys path") {
    // manspec_bloom_t / manspec_bloom_idx built by the fileBloom test
    val keys = Seq(12L, 777L, 3000L, 5999L)
    val viaLiterals = Manifest.bloomPrunedFiles(spark, "manspec_bloom_idx",
      keys, 1 << 16, 4)
    val viaDf = Manifest.bloomPrunedFilesFor(spark, "manspec_bloom_idx",
      keys.toDF("key"), col("key"), 1 << 16, 4)
    assert(viaDf === viaLiterals,
      "DataFrame-keyed file pruning must match the literal-keys path")
    // the join-scan form: scan only surviving files, exact join after
    val t = spark.table("manspec_bloom_t")
    val build = keys.toDF("key").withColumn("tag", concat(lit("t"), $"key"))
    val viaScan = Manifest.bloomPrunedJoinScan(spark, t,
        "manspec_bloom_idx", build, col("key"), 1 << 16, 4)
      .join(build, Seq("key"))
      .select($"key", $"payload", $"tag")
    val exact = t.join(build, Seq("key")).select($"key", $"payload", $"tag")
    assert(viaScan.exceptAll(exact).isEmpty && exact.exceptAll(viaScan).isEmpty,
      "file-pruned join diverged from the exact join")
    // an int-typed build side canonicalizes and still finds its files
    val intKeys = keys.toDF("key").select($"key".cast("int").as("key"))
    assert(Manifest.bloomPrunedFilesFor(spark, "manspec_bloom_idx",
      intKeys, col("key"), 1 << 16, 4) === viaLiterals)
    // a disjoint build side prunes to (at most false-positive) files
    val absent = spark.range(900000, 900004).select($"id".as("key"))
    val absentFiles = Manifest.bloomPrunedFilesFor(spark,
      "manspec_bloom_idx", absent, col("key"), 1 << 16, 4)
    assert(absentFiles.size < viaLiterals.size + 4)
  }

  test("refreshFileBloom: incremental index equals full rebuild; swaps tracked") {
    val dir = java.nio.file.Files.createTempDirectory("manspec_fbr").toString
    spark.range(0, 2000).select($"id".as("key"), ($"id" * 3).as("payload"))
      .repartitionByRange(4, $"key").write.mode("overwrite").parquet(dir)
    Manifest.writeFileBloom(spark.read.parquet(dir), col("key"),
      mBits = 1 << 14, k = 4, "manspec_fbr_idx")
    // no-op refresh: nothing new
    assert(Manifest.refreshFileBloom(spark, spark.read.parquet(dir),
      "manspec_fbr_idx") === 0L)
    // append two files and remove one (the compaction swap shape)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val victim = spark.read.parquet(dir).inputFiles.map(Manifest.norm)
      .sorted.head
    fs.delete(new org.apache.hadoop.fs.Path(victim), false)
    spark.range(2000, 2600).select($"id".as("key"), ($"id" * 3).as("payload"))
      .repartitionByRange(2, $"key").write.mode("append").parquet(dir)
    assert(Manifest.refreshFileBloom(spark, spark.read.parquet(dir),
      "manspec_fbr_idx") === 2L)
    // refreshed index == full rebuild over the current directory
    Manifest.writeFileBloom(spark.read.parquet(dir), col("key"),
      mBits = 1 << 14, k = 4, "manspec_fbr_full")
    def rows(tbl: String) = spark.table(tbl)
      .select(regexp_extract($"file", "part-[^/]*$", 0).as("f"), $"w", $"bits")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows("manspec_fbr_idx") === rows("manspec_fbr_full"))
    // and lookups through the refreshed index stay exact (keys from a
    // new file, a surviving file, and the deleted range)
    val t = spark.read.parquet(dir)
    val viaBloom = Manifest.bloomPrunedRead(spark, t, "manspec_fbr_idx",
      "key", Seq(100L, 1500L, 2345L), 1 << 14, 4).select($"key", $"payload")
    val exact = t.filter($"key".isin(100L, 1500L, 2345L))
      .select($"key", $"payload")
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty)
    // a scan whose key column canonicalizes differently fails fast
    intercept[IllegalArgumentException] {
      Manifest.refreshFileBloom(spark,
        t.select($"key".cast("string").as("key"), $"payload"),
        "manspec_fbr_idx")
    }
  }

  test("stats/index builds reject transformed inputs (plain-scan contract)") {
    val t = spark.table("manspec_base")
    // a filter above the scan would make pruning UNSOUND (stats over
    // surviving rows, reads return whole files) — fail fast
    intercept[IllegalArgumentException] {
      Manifest.fileStats(t.filter($"v" > 100), Seq("v"))
    }
    intercept[IllegalArgumentException] {
      Manifest.fileBloom(t.select(($"v" * 2).as("v")), col("v"), 1 << 12, 4)
    }
    // the plain forms still pass: catalog table and direct read
    assert(Manifest.fileStats(t, Seq("v")).count() > 0)
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
