package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{JoinReduce, Layout, Manifest}

/** Scaling soak for the round-9 read-path tier: derive 3x and 10x
  * fact tables from sf0.1 lineitem (key-shifted copies — same
  * distributions, distinct keys) and at each scale measure:
  *
  *  - z-layout WRITE time (the pay-once cost; expect ~linear), and
  *    the probe scan-row FRACTION after row-group skipping (expect
  *    ~flat — pruning effectiveness must not decay as files grow);
  *  - manifest file-pruning fraction (expect ~flat) and the
  *    incremental-refresh cost of one appended batch vs a full
  *    rebuild (expect delta-sized, not corpus-sized);
  *  - Bloom join reduction percentage (expect ~flat: the reduction
  *    is a per-row predicate, independent of corpus size) and the
  *    bitset build time (linear in the BUILD side only, which does
  *    NOT grow with the fact table here — the scale story).
  *
  * Writes to the session warehouse + /tmp only.
  */
object ScaleSoakLayout {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity")
    val orders = Tables.load(spark, sfDir, "orders")

    // copy k: keys shifted into a disjoint band, same value shapes
    def copyK(k: Int): DataFrame = base.select(
      ($"l_orderkey" + lit(k * 100000000L)).as("l_orderkey"),
      ($"l_partkey" + lit(k * 1000000L)).as("l_partkey"),
      $"l_suppkey", $"l_quantity")

    def corpus(mult: Int): DataFrame =
      (0 until mult).map(copyK).reduce(_ unionByName _)

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // untimed warmup leg (VERDICT r9 item 7): the first run of a fresh
    // JVM showed 5-10x transients on the metadata-heavy steps (codegen
    // compile, committer init, parquet footer cache) that reproduce on
    // no later leg; a miniature write/manifest/refresh cycle absorbs
    // them so every recorded leg is steady-state
    val warm = base.limit(10000)
    Layout.writeZOrdered(warm, "soak_warm", Seq("l_partkey", "l_suppkey"),
      bits = 8, nRanges = 2)
    Manifest.writeManifest(spark.table("soak_warm"), "soak_warm_man",
      Seq("l_partkey", "l_suppkey"))
    Manifest.refreshManifest(spark, spark.table("soak_warm"),
      "soak_warm_man", Seq("l_partkey", "l_suppkey"))
    JoinReduce.bloomWords(warm, $"l_orderkey", 1 << 12, 4)

    for (mult <- Seq(1, 3, 10)) {
      val c = corpus(mult)
      val n = c.count()
      val files = 32 * mult // hold rows/file constant as the corpus grows
      val tbl = s"soak_z_$mult"
      val man = s"soak_man_$mult"

      val (_, wz) = t(Layout.writeZOrdered(c, tbl,
        Seq("l_partkey", "l_suppkey"), bits = 8, nRanges = files))
      val z = spark.table(tbl)

      // probe: fixed 0.5% of the 1x suppkey domain (present at every mult)
      val probe = z.filter($"l_suppkey".between(10, 14))
        .agg(sum($"l_quantity"), count(lit(1)))
      probe.collect()
      val scanned = PlanWalk.scanOutputRows(probe)

      val (_, wm) = t(Manifest.writeManifest(z, man,
        Seq("l_partkey", "l_suppkey")))
      val sel = Manifest.prunedFiles(spark, man, "l_suppkey",
        lit(10L), lit(14L)).size

      // one appended delta batch (1/32 of the 1x corpus), then refresh
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val delta = base.limit(600000 / 32)
        .select(($"l_orderkey" + lit(999000000L)).as("l_orderkey"),
          ($"l_partkey" + lit(99000000L)).as("l_partkey"),
          $"l_suppkey", $"l_quantity")
      delta.write.mode("append").parquet(s"$warehouse/$tbl")
      val (nNew, wr) = t(Manifest.refreshManifest(spark,
        spark.read.parquet(s"$warehouse/$tbl"), man,
        Seq("l_partkey", "l_suppkey")))
      // isolate fixed overhead: a no-op refresh does the same listing
      // and diff but stats nothing and rewrites nothing
      val (_, wr0) = t(Manifest.refreshManifest(spark,
        spark.read.parquet(s"$warehouse/$tbl"), man,
        Seq("l_partkey", "l_suppkey")))

      // bloom: the BUILD side is one order month of the 1x orders —
      // it does not grow with the fact table
      val o = orders
        .filter($"o_orderdate" >= lit("1995-03-01").cast("timestamp") &&
          $"o_orderdate" < lit("1995-04-01").cast("timestamp"))
        .select($"o_orderkey")
      val (words, wb) = t(JoinReduce.bloomWords(o, $"o_orderkey", 1 << 16, 4))
      val reduced = c.filter(
        JoinReduce.mightContain(words, 1 << 16, 4, $"l_orderkey")).count()

      println(f"[soaklayout] mult=$mult%-2d rows=$n%9d files=$files%3d " +
        f"zwrite=$wz%6.2fs scanfrac=${100.0 * scanned / n}%5.2f%% " +
        f"manwrite=$wm%5.2fs filesel=$sel/$files " +
        f"refresh=${wr}%5.2fs(new=$nNew,noop=$wr0%4.2fs) " +
        f"bloombuild=$wb%5.2fs passfrac=${100.0 * reduced / n}%5.2f%%")
    }
    spark.stop()
  }
}
