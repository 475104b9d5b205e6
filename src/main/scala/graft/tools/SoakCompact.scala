package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Layout, Manifest}

/** Compaction soak (round 10): measures the decay-and-restore cycle
  * [[graft.ops.Layout.compactLayout]] exists for, against sf0.1
  * lineitem:
  *
  *  1. z-write the base corpus, record the probe's scan-row fraction
  *     (post row-group skipping) — the healthy baseline;
  *  2. append N un-clustered delta batches; after each, record the
  *     fraction again — expect monotone decay toward (base pruned +
  *     ALL delta rows), because an un-clustered file spans the whole
  *     clustered domain;
  *  3. compactLayout, record (a) the restored fraction, (b) the
  *     compaction wall time vs a FULL writeZOrdered rewrite of the
  *     same table — the delta-sized-cost claim measured, not argued;
  *  4. refreshManifest over the swap (rows both added and removed)
  *     and verify file-level selection tightens again.
  *
  * Writes to the session warehouse only. Each timed leg runs after an
  * untimed warmup probe so page-cache/codegen transients don't land
  * in the recorded numbers (VERDICT r9 item 7).
  */
object SoakCompact {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // at 1x (600k rows) fixed overheads (catalog ops, stage-and-swap,
    // registry write) dominate both paths and hide the asymptotics;
    // the 10x leg (6M rows, same 1/16-of-1x delta) is where the
    // delta-sized-vs-corpus-sized separation must show
    val mult = sys.env.getOrElse("SPARK_GRAFT_SOAK_MULT", "10").toInt
    val one = Tables.load(spark, sfDir, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    val base = (0 until mult).map(i => one.select(
        ($"l_partkey" + lit(1000000L * i)).as("l_partkey"),
        $"l_suppkey", $"l_quantity"))
      .reduce(_ unionByName _)
    val nBase = base.count()

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val tbl = "soakc_z"
    val man = "soakc_man"
    val cols = Seq("l_partkey", "l_suppkey")

    def probeFrac(): Double = {
      val z = spark.table(tbl)
      val q = z.filter($"l_suppkey".between(10, 14))
        .agg(sum($"l_quantity"), count(lit(1)))
      q.collect() // warmup (footers, codegen)
      val q2 = z.filter($"l_suppkey".between(10, 14))
        .agg(sum($"l_quantity"), count(lit(1)))
      q2.collect()
      100.0 * PlanWalk.scanOutputRows(q2) / spark.table(tbl).count()
    }

    val (_, wz) = t(Layout.writeZOrdered(base, tbl, cols,
      bits = 8, nRanges = 32 * mult))
    Manifest.writeManifest(spark.table(tbl), man, cols)
    println(f"[soakcompact] base rows=$nBase zwrite=$wz%6.2fs " +
      f"scanfrac=${probeFrac()}%5.2f%% " +
      f"filesel=${Manifest.prunedFiles(spark, man, "l_suppkey",
        lit(10L), lit(14L)).size}/${spark.table(tbl).inputFiles.length}")

    // 4 delta appends of 1/16 of the base each (25% total growth)
    val deltaRows = (nBase / 16).toInt
    for (i <- 1 to 4) {
      val delta = base.limit(deltaRows)
        .select(($"l_partkey" + lit(1000000L * (100 + i))).as("l_partkey"),
          $"l_suppkey", $"l_quantity")
      Layout.appendPlain(delta, tbl)
      Manifest.refreshManifest(spark, spark.table(tbl), man, cols)
      println(f"[soakcompact] +delta$i rows=${spark.table(tbl).count()} " +
        f"scanfrac=${probeFrac()}%5.2f%% " +
        f"filesel=${Manifest.prunedFiles(spark, man, "l_suppkey",
          lit(10L), lit(14L)).size}/${spark.table(tbl).inputFiles.length}")
    }

    // the OPTIMIZE: delta-sized re-cluster
    val (nCompacted, wc) = t(Layout.compactLayout(spark, tbl, cols,
      bits = 8, nRanges = 8))
    val (nRef, wrf) = t(Manifest.refreshManifest(spark, spark.table(tbl),
      man, cols))
    println(f"[soakcompact] compact files=$nCompacted wall=$wc%6.2fs " +
      f"manrefresh=$wrf%5.2fs(new=$nRef) scanfrac=${probeFrac()}%5.2f%% " +
      f"filesel=${Manifest.prunedFiles(spark, man, "l_suppkey",
        lit(10L), lit(14L)).size}/${spark.table(tbl).inputFiles.length}")

    // the alternative compaction would have paid: a full rewrite of
    // the grown table (the cost compactLayout avoids)
    val grown = spark.table(tbl).select($"l_partkey", $"l_suppkey",
      $"l_quantity")
    val (_, wFull) = t(Layout.writeZOrdered(grown, "soakc_full", cols,
      bits = 8, nRanges = 32 * mult + 8))
    println(f"[soakcompact] fullrewrite wall=$wFull%6.2fs " +
      f"(compact was $wc%5.2fs = ${100.0 * wc / wFull}%4.1f%%)")
    spark.stop()
  }
}
