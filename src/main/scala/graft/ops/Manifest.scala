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
