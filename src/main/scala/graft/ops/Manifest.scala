package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-statistics manifest — planning-time file pruning for the
  * 100 TB scan problem, the layer ABOVE [[Layout]]'s row-group
  * skipping.
  *
  * Parquet footer stats let a reader skip row groups, but every query
  * still opens every file to READ those footers: at 100 TB that is
  * ~100k metadata round-trips before the first data byte. Lakehouse
  * table formats (Iceberg manifests, Delta's add-file stats, Hudi
  * metadata) solve it by persisting per-file column stats in a tiny
  * side table the PLANNER consults: one scan of a file-count-sized
  * manifest replaces opening every footer, and files whose
  * [min,max] cannot overlap the predicate are never touched at all.
  * Combined with a z-ordered layout ([[Layout.writeZOrdered]]) the
  * manifest prunes on EVERY clustered column.
  *
  * The stats build is one in-plan aggregate over the data grouped by
  * `input_file_name()` — no driver collect. The query path does
  * collect the SURVIVING FILE LIST, which is bounded by file count
  * and is precisely the planner's job (Spark's own FileIndex
  * materializes the same list when listing a directory); pruning
  * is sound because min/max ignore nulls and a range predicate can
  * only match rows in files whose stats interval overlaps it.
  */
object Manifest {

  /** Per-file stats over `cols`: one row per underlying file with the
    * row count and each column's min/max. `df` must be a plain file
    * scan (a table or `spark.read.parquet(dir)`) — transformations
    * above the scan would decouple `input_file_name` from the stats.
    */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one stats column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Persist the manifest as a managed asset table (stage-and-swap —
    * readers never see a half-built manifest).
    */
  def writeManifest(df: DataFrame, manifestTable: String,
                    cols: Seq[String]): Unit =
    graft.Tables.writeTable(fileStats(df, cols), manifestTable)

  /** The files whose [min,max] interval for `c` overlaps [lo, hi] —
    * the bounded planning-time collect (manifest rows = file count).
    * Files with all-null `c` carry null stats and are excluded,
    * which is sound: their rows cannot satisfy a range predicate.
    */
  def prunedFiles(spark: SparkSession, manifestTable: String,
                  c: String, lo: Column, hi: Column): Seq[String] = {
    import spark.implicits._
    spark.table(manifestTable)
      .filter(col(s"min_$c") <= hi && col(s"max_$c") >= lo)
      .select($"file").as[String].collect().toSeq
  }

  /** Incrementally extend a persisted manifest: stat ONLY the files
    * the manifest does not cover yet and fold their rows in. Sound
    * because parquet files are immutable — an existing file's stats
    * row can never go stale; new data arrives as new files (exactly
    * the shape the streaming sinks append). The file-list diff uses
    * planning metadata (`inputFiles`) — no data is read for known
    * files — normalized through Path/URI because `input_file_name()`
    * (the manifest's key) and `inputFiles` render the scheme
    * differently (file:/// vs file:/). Returns the number of newly
    * statted files. The merged rewrite is manifest-sized (file count
    * rows), via stage-and-swap.
    */
  def refreshManifest(spark: SparkSession, fullScan: DataFrame,
                      manifestTable: String, cols: Seq[String]): Long = {
    import spark.implicits._
    def norm(s: String): String =
      new org.apache.hadoop.fs.Path(java.net.URI.create(s)).toString
    val known = spark.table(manifestTable).select($"file").as[String]
      .collect().map(norm).toSet
    val newFiles = fullScan.inputFiles.map(norm).filterNot(known).sorted
    if (newFiles.nonEmpty) {
      val merged = spark.table(manifestTable)
        .unionByName(fileStats(spark.read.parquet(newFiles: _*), cols))
      graft.Tables.writeTable(merged, manifestTable)
    }
    newFiles.length.toLong
  }

  /** Per-file Bloom index over a key column — the point-lookup
    * manifest (the Hudi/Iceberg bloom-index pattern): one row per
    * (file, bitset word), built by one in-plan pass (k hash
    * positions per row -> per-file word bit_or). Min/max stats
    * answer RANGE probes; this answers "which files can contain
    * THESE keys" for keys with no range locality. Hash family shared
    * with [[JoinReduce]] so any engine rebuilds it identically.
    */
  def fileBloom(df: DataFrame, key: Column, mBits: Int, k: Int): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k <= 8, s"k must be 1..8, got $k")
    val posCols = (0 until k).map(j => JoinReduce.bloomPos(j, key, mBits))
    df.select(input_file_name().as("file"),
        explode(array(posCols: _*)).as("pos"))
      .select(col("file"), floor(col("pos") / 64).cast("long").as("w"),
        expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("m"))
      .groupBy(col("file"), col("w")).agg(bit_or(col("m")).as("bits"))
  }

  /** Persist the per-file Bloom index (stage-and-swap). */
  def writeFileBloom(df: DataFrame, key: Column, mBits: Int, k: Int,
                     bloomTable: String): Unit =
    graft.Tables.writeTable(fileBloom(df, key, mBits, k), bloomTable)

  /** The files that may contain ANY of `keys`: a file qualifies for a
    * key iff all k of the key's bits are set in that file's bitset —
    * checked with ONE join of the (keys x k)-row probe table against
    * the index (word-keyed equi-join, index side pruned by the
    * pushed `w` IN-filter), then a per-(file,key) count. False
    * positives possible (the caller re-filters rows), false
    * negatives impossible. The returned list is the bounded
    * planning-time collect, as in [[prunedFiles]].
    */
  def bloomPrunedFiles(spark: SparkSession, bloomTable: String,
                       keys: Seq[Long], mBits: Int, k: Int): Seq[String] = {
    import spark.implicits._
    val probes = keys.toDF("key")
      .select(col("key"), explode(array((0 until k).map(j =>
        JoinReduce.bloomPos(j, col("key"), mBits)): _*)).as("pos"))
      .select(col("key"), floor(col("pos") / 64).cast("long").as("w"),
        expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("m"))
    spark.table(bloomTable).join(probes, Seq("w"))
      .filter((col("bits").bitwiseAND(col("m"))) =!= 0L)
      .groupBy(col("file"), col("key"))
      .agg(count(lit(1)).as("n_bits"))
      .filter(col("n_bits") === k)
      .select($"file").distinct().as[String].collect().toSeq.sorted
  }

  /** Point-lookup read: scan only bloom-surviving files, then apply
    * the exact IN-filter (bloom false positives die here).
    */
  def bloomPrunedRead(spark: SparkSession, fullScan: DataFrame,
                      bloomTable: String, keyCol: String,
                      keys: Seq[Long], mBits: Int, k: Int): DataFrame = {
    val files = bloomPrunedFiles(spark, bloomTable, keys, mBits, k)
    val base =
      if (files.isEmpty) fullScan.where(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(keyCol).isin(keys: _*))
  }

  /** Range-predicate read that touches ONLY manifest-surviving files.
    * `fullScan` supplies the schema for the empty-selection case (a
    * zero-file parquet read has none); the predicate is ALSO applied
    * row-level, so manifest false positives (a file whose range
    * overlaps but holds no matching row) cost I/O, never wrong rows.
    */
  def prunedRead(spark: SparkSession, fullScan: DataFrame,
                 manifestTable: String,
                 c: String, lo: Column, hi: Column): DataFrame = {
    val files = prunedFiles(spark, manifestTable, c, lo, hi)
    val base =
      if (files.isEmpty) fullScan.where(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(c) >= lo && col(c) <= hi)
  }
}
