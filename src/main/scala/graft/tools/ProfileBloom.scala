package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.JoinReduce

/** Isolated profile for the q123 Bloom semi-join reduction: times the
  * reduced join against the identical UNREDUCED shuffle join and
  * reports shuffle records/bytes written by each, which is the thing
  * the reduction exists to shrink. Scratch tool, not library surface.
  */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // collect(), not a noop write: the write path builds its OWN
    // QueryExecution, leaving df.queryExecution unexecuted and every
    // metric zero. The aggregate output here is 5 rows.
    def shuffleWritten(df: DataFrame): (Long, Long) = {
      df.collect()
      PlanWalk.shuffleWritten(df)
    }

    def times(name: String, runs: Int)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[bloom] $name%-18s min ${ts.head}%.3f  med ${ts(ts.size / 2)}%.3f  max ${ts.last}%.3f")
    }

    val mBits = 1 << 16
    val k = 4
    val o = Tables.load(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit("1995-03-01").cast("timestamp") &&
        $"o_orderdate" < lit("1995-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_orderpriority")
    val li = Tables.load(spark, sfDir, "lineitem")

    def agg(j: DataFrame): DataFrame = j.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"))

    val plainJoin = agg(li.join(o.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey"))
    val words = JoinReduce.bloomWords(o, $"o_orderkey", mBits, k)
    val bloomJoin = agg(
      li.filter(JoinReduce.mightContain(words, mBits, k, $"l_orderkey"))
        .join(o.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey"))

    val (pr, pb) = shuffleWritten(plainJoin)
    val (br, bb) = shuffleWritten(bloomJoin)
    println(s"[bloom] plain join: shuffle rows=$pr bytes=$pb")
    println(s"[bloom] bloom join: shuffle rows=$br bytes=$bb")
    println(f"[bloom] reduction: rows ${100.0 * (pr - br) / math.max(pr, 1)}%.1f%%  " +
      f"bytes ${100.0 * (pb - bb) / math.max(pb, 1)}%.1f%%")
    times("plain_join", 7)(plainJoin)
    times("bloom_join", 7)(bloomJoin)

    // file-level reduction (q133): on a partkey-clustered copy with a
    // per-file bloom index, a SMALL SCATTERED dimension key set opens
    // only the files that can contain one of its keys. Two build
    // sides measured: ~10 scattered part keys (the case the index
    // exists for) and q123's month-of-orders (a key set UNIFORM over
    // the whole domain — file pruning is provably vacuous there:
    // P(file has none of n uniform keys) = (1-1/F)^n ~ 0 for n >> F;
    // that case belongs to the ROW-level filter above).
    val mB2 = 1 << 17
    graft.Tables.writeTable(
      li.select($"l_partkey", $"l_quantity")
        .repartitionByRange(64, $"l_partkey")
        .sortWithinPartitions($"l_partkey"),
      "profb_pkcluster")
    graft.ops.Manifest.writeFileBloom(spark.table("profb_pkcluster"),
      $"l_partkey", mB2, k, "profb_pkbloom")
    val zli = spark.table("profb_pkcluster")
    val nFiles = zli.inputFiles.length
    // sf0.1 part has 20k keys; % 1999 leaves 10, scattered end to end
    val p = Tables.load(spark, sfDir, "part")
      .filter($"p_partkey" % 1999 === 0)
      .select($"p_partkey", $"p_brand")
    val files = graft.ops.Manifest.bloomPrunedFilesFor(spark,
      "profb_pkbloom", p, $"p_partkey", mB2, k)
    def scanRows(df: DataFrame): Long = {
      df.collect(); PlanWalk.scanOutputRows(df)
    }
    def agg2(j: DataFrame): DataFrame = j.groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"))
    val fullScanJoin = agg2(zli
      .join(p.hint("shuffle_hash"), $"l_partkey" === $"p_partkey"))
    val prunedScanJoin = agg2(graft.ops.Manifest.bloomPrunedJoinScan(
        spark, zli, "profb_pkbloom", p, $"p_partkey", mB2, k)
      .join(p.hint("shuffle_hash"), $"l_partkey" === $"p_partkey"))
    println(s"[bloom] file-level: ${files.size}/$nFiles files survive the 10-key probe")
    println(s"[bloom] full-scan join reads ${scanRows(fullScanJoin)} rows; " +
      s"file-pruned reads ${scanRows(prunedScanJoin)}")
    val oFiles = graft.ops.Manifest.bloomPrunedFilesFor(spark,
      "profb_pkbloom", li.select($"l_partkey").distinct().limit(2000),
      $"l_partkey", mB2, k)
    println(s"[bloom] file-level with a 2000-key uniform build: " +
      s"${oFiles.size}/$nFiles survive (vacuous by design -> use the row filter)")
    times("fullscan_join", 7)(fullScanJoin)
    times("filepruned_join", 7)(prunedScanJoin)
    spark.stop()
  }
}
