package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Layout

/** Isolated profile for the q124 z-order layout: rows emitted by the
  * parquet scan (post row-group skipping) for a selective probe on
  * EACH clustered column, z-layout vs single-column-sorted baseline,
  * plus probe latencies. Scratch tool, not library surface.
  */
object ProfileZorder {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // collect(), not a noop write: the write path builds its OWN
    // QueryExecution, leaving df.queryExecution unexecuted and every
    // metric zero. The probe aggregates collapse to one row.
    def scanRows(df: DataFrame): Long = {
      df.collect()
      PlanWalk.scanOutputRows(df)
    }

    def times(name: String, runs: Int)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save()
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[zorder] $name%-22s min ${ts.head}%.3f  med ${ts(ts.size / 2)}%.3f  max ${ts.last}%.3f")
    }

    val li = Tables.load(spark, sfDir, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_quantity", $"l_extendedprice")
    val n = li.count()

    val t0 = System.nanoTime()
    Layout.writeZOrdered(li, "prof_z_lineitem",
      Seq("l_partkey", "l_suppkey"), bits = 8, nRanges = 32)
    println(f"[zorder] z-layout write: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    Tables.writeTable(
      li.repartitionByRange(32, $"l_partkey").sortWithinPartitions("l_partkey"),
      "prof_psort_lineitem")
    println(f"[zorder] part-sorted write: ${(System.nanoTime() - t1) / 1e9}%.2f s")

    val z = spark.table("prof_z_lineitem")
    val ps = spark.table("prof_psort_lineitem")
    // selective probes: 0.5% of each key domain at sf0.1
    val partProbe = $"l_partkey".between(100, 199)
    val suppProbe = $"l_suppkey".between(10, 14)
    def probe(t: DataFrame, p: org.apache.spark.sql.Column): DataFrame =
      t.filter(p).agg(sum($"l_quantity").as("s"), count(lit(1)).as("n"))

    println(s"[zorder] table rows: $n")
    println(s"[zorder] scan rows, part-probe: zorder=${scanRows(probe(z, partProbe))} " +
      s"part-sorted=${scanRows(probe(ps, partProbe))}")
    println(s"[zorder] scan rows, supp-probe: zorder=${scanRows(probe(z, suppProbe))} " +
      s"part-sorted=${scanRows(probe(ps, suppProbe))}")
    times("zorder_supp_probe", 7)(probe(z, suppProbe))
    times("psort_supp_probe", 7)(probe(ps, suppProbe))
    times("zorder_part_probe", 7)(probe(z, partProbe))
    times("psort_part_probe", 7)(probe(ps, partProbe))

    // manifest layer: file-level pruning counts over the same z copy
    graft.ops.Manifest.writeManifest(z, "prof_z_manifest",
      Seq("l_partkey", "l_suppkey"))
    val total = spark.table("prof_z_manifest").count()
    val fPart = graft.ops.Manifest.prunedFiles(spark, "prof_z_manifest",
      "l_partkey", lit(100L), lit(199L)).size
    val fSupp = graft.ops.Manifest.prunedFiles(spark, "prof_z_manifest",
      "l_suppkey", lit(10L), lit(14L)).size
    println(s"[zorder] manifest files: total=$total part-probe=$fPart supp-probe=$fSupp")

    // equi-depth bucketing cost: the r10 unrolled binary search
    // (bits codegen'd element_at probes / row / col) vs the r9 HOF
    // filter spec (2^bits interpreted lambda evals / row / col) —
    // same 1-row boundary attach, measured over a 10x union
    val big = (0 until 10).map(i => li.select(
        ($"l_partkey" + lit(1000000L * i)).as("l_partkey"),
        $"l_suppkey", $"l_quantity", $"l_extendedprice"))
      .reduce(_ unionByName _)
    val cols = Seq("l_partkey", "l_suppkey")
    val nb = 1 << 8
    val pcts = typedLit((1 until nb).map(_.toDouble / nb))
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), pcts, lit(10000))
        .as(s"_bnd_$c"))
    val stats = big.agg(aggs.head, aggs.tail: _*)
    val hofForm = big.crossJoin(broadcast(stats)).select(
      cols.map(c => Layout.equiDepthBucketSpec(col(c), col(s"_bnd_$c"))
        .as(s"_b_$c")): _*)
    times("equidepth_binsearch", 5)(
      Layout.withRankBucketsEquiDepth(big, cols, bits = 8)
        .select(cols.map(c => col(s"_b_$c")): _*))
    times("equidepth_hof_spec", 5)(hofForm)
    spark.stop()
  }
}
