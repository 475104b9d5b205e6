package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 scaling soak: the new corpus-pass paths — the quantile
  * sketch build, the rolling trailing-window quantiles, and the BPE
  * APPLY pass — timed at 1x/3x/10x synthetic scale. Near-linear
  * growth is the measured form of the 100 TB claim: the sketch's
  * per-group state is k-bounded, the rolling merge explodes sketch
  * rows (not facts), and segmentation is a map-only replace chain.
  *
  * Second section (q187): full CC rerun vs ccIncremental under a
  * FIXED 500-merge delta as the prior graph scales 1x/3x/10x — the
  * incremental leg must stay ~flat (its work is affected+delta-sized)
  * while the full rerun grows with the corpus. Writes to /tmp only.
  * Scratch tool, not part of the library surface.
  */
object ScaleSoakR12 {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => DataFrame): Double = {
      f.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[soak-r12] $name%-28s $s%8.3f s")
      s
    }

    // synthetic event facts: 600k rows per scale unit over a 90-day
    // span, value long-tailed via squaring so quantiles are non-flat
    def events(scale: Int): DataFrame =
      spark.range(0, 600000L * scale).select(
        $"id".cast("string").as("k"),
        timestamp_micros(($"id" % 90) * 86400000000L + $"id" % 1000000L)
          .as("ts"),
        (($"id" % 997).cast("double") * ($"id" % 997).cast("double"))
          .as("value"))

    // token-rotated document copies (the ScaleSoak recipe) for the
    // BPE apply leg
    val baseDocs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text")
    def rotated(k: Int): DataFrame = {
      val t = split($"text", " ")
      val n = size(t)
      val shift = lit(7 * k) % greatest(n, lit(1))
      baseDocs.select(
        ($"doc_id" + lit(k * 10000000L)).as("doc_id"),
        when(n > 1, concat_ws(" ",
          concat(slice(t, shift + 1, n - shift), slice(t, lit(1), shift))))
          .otherwise($"text").as("text"))
    }
    val merges = graft.ops.TextAnalysis.bpeTrain(baseDocs, "text", 10)
    merges.cache().count() // train once; the soak times APPLY only

    Seq(1, 3, 10).foreach { c =>
      val evPath = s"/tmp/scale_soak_r12/events_x$c"
      events(c).write.mode("overwrite").parquet(evPath)
      val ev = spark.read.parquet(evPath)
      val docsPath = s"/tmp/scale_soak_r12/docs_x$c"
      (0 until c).map(rotated).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(docsPath)
      val docs = spark.read.parquet(docsPath)
      println(s"[soak-r12] ---- ${c}x (${ev.count()} events, " +
        s"${docs.count()} docs) ----")
      time(s"quantile_partials_x$c")(
        graft.ops.Sketches.quantilePartials(
          ev.withColumn("day",
            (unix_micros($"ts") / 86400000000L).cast("long")),
          Seq("day"), $"k", $"value", k = 256))
      time(s"rolling_quantiles_x$c")(
        graft.ops.Sessions.rollingQuantiles(ev, "k", "ts", "value",
          windowDays = 7, k = 256, permille = Seq(500, 990)))
      time(s"bpe_segment_x$c")(
        graft.ops.TextAnalysis.bpeSegment(docs, "doc_id", "text", merges))
    }

    // ---- incremental CC: fixed delta on a growing prior graph ----
    // base: 4-node cliques (50k components per scale unit); delta:
    // 500 edges each merging two cliques far apart — affected slice
    // is 1000 components regardless of scale
    def cliqueEdges(scale: Int): DataFrame =
      spark.range(0, 150000L * scale).select(
        (($"id" / 3).cast("long") * 4L).as("doc_a"),
        (($"id" / 3).cast("long") * 4L + 1L + ($"id" % 3L)).as("doc_b"))
    val delta = spark.range(0, 500L).select(
      ($"id" * 8L).as("doc_a"), ($"id" * 8L + 4L).as("doc_b"))
    delta.cache().count()
    Seq(1, 3, 10).foreach { c =>
      val edgePath = s"/tmp/scale_soak_r12/edges_x$c"
      cliqueEdges(c).write.mode("overwrite").parquet(edgePath)
      val edges = spark.read.parquet(edgePath)
      // prior labels persisted then re-read: the incremental leg's
      // lineage starts from a scan, as it would in production
      val lblPath = s"/tmp/scale_soak_r12/labels_x$c"
      graft.ops.Dedup.connectedComponentsWithRounds(edges)._1
        .write.mode("overwrite").parquet(lblPath)
      val prev = spark.read.parquet(lblPath)
      println(s"[soak-r12] ---- cc ${c}x (${edges.count()} edges) ----")
      time(s"full_cc_x$c")(
        graft.ops.Dedup.connectedComponentsWithRounds(
          edges.unionByName(delta))._1)
      time(s"inc_cc_x$c")(
        graft.ops.Dedup.ccIncremental(prev, delta))
    }
    spark.stop()
  }
}
