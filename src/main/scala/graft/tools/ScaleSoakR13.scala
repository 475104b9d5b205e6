package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 scaling soak: the three new families at 1x/3x/10x.
  *
  *  1. Image dHash near-dup (q211): synthetic 18×16 stored-PNG corpora
  *     with a planted 10% brightness-shift duplicate rate — times the
  *     map-only decode+hash pass and the banded pair join + CC
  *     separately. Expectation: both near-linear (hash is map-only;
  *     pair volume is planted-duplicate-bounded + capped buckets).
  *  2. Maintained containment (q214): a FIXED 2k-doc delta batch fed
  *     onto a grown state. The df-count window pass scans state ∪
  *     batch (the linkBatch shape), so the honest asymptote is
  *     linear-in-state per batch — but the PAIR work is
  *     new-vs-block-mates only, and measured (PROFILE round 13) the
  *     state-sized count pass is a cheap shuffle: 4.2/6.4/5.3 s at
  *     1x/3x/10x state, ~flat at these sizes.
  *  3. Streaming top-k (q213): per-batch fold cost after a growing
  *     number of prior batches. Expectation: FLAT — state is keys × k
  *     bounded regardless of history, so the fold never touches more
  *     than batch + keys × k rows.
  */
object ScaleSoakR13 {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[soak-r13] $name%-30s $s%8.3f s")
      s
    }
    def timeDf(name: String)(f: => DataFrame): Double =
      time(name)(f.write.mode("overwrite").format("noop").save())

    // ---- 1. image dHash near-dup ------------------------------------
    // 6k PNGs per scale unit; in each group of 10, image 9 is a +16
    // brightness shift of image 0 (dHash-identical by exact integer
    // arithmetic), the rest are distinct patterns
    def pngs(n: Long): DataFrame =
      spark.range(0, n).as[Long].map { i =>
        val grp = (i / 10) * 10
        val dup = i % 10 == 9
        val s = if (dup) grp else i
        val d = if (dup) 16 else 0
        val bytes = graft.ops.Media.pngFixture(18, 16) { (x, y) =>
          (d + 8 + ((x * (2 + (s % 7)).toInt + y * (3 + (s % 11)).toInt
             + (s % 13).toInt * 5) * 7) % 160,
            d + 8 + ((x * (5 + (s % 5)).toInt + y * (1 + (s % 3)).toInt
              + (s % 17).toInt) * 11) % 160,
            d + 8 + ((x + y * (2 + (s % 9)).toInt + (s % 19).toInt * 3)
              * 13) % 160)
        }
        (i, bytes)
      }.toDF("doc_id", "bin")

    Seq(1, 3, 10).foreach { c =>
      val p = s"/tmp/scale_soak_r13/pngs_x$c"
      pngs(6000L * c).write.mode("overwrite").parquet(p)
      val blobs = spark.read.parquet(p)
      println(s"[soak-r13] ---- dhash ${c}x (${blobs.count()} images) ----")
      val fpPath = s"/tmp/scale_soak_r13/fps_x$c"
      time(s"dhash_decode_x$c") {
        graft.ops.Media.dhashImages(blobs, "doc_id", "bin")
          .filter($"ok")
          .select($"id".as("doc_id"), $"dhash".as("fp"))
          .write.mode("overwrite").parquet(fpPath)
      }
      val fps = spark.read.parquet(fpPath)
      timeDf(s"dhash_pairs_cc_x$c")(
        graft.ops.Dedup.duplicateClusters(
          graft.ops.Dedup.hammingPairs(fps, maxDist = 6)
            .select($"doc_a", $"doc_b")))
    }

    // ---- 2. maintained containment: fixed delta on grown state -----
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
    val deltaDocs = baseDocs.filter($"doc_id" % 37 === 0)
      .select(($"doc_id" + 900000000L).as("doc_id"), $"text")
    deltaDocs.cache().count()
    Seq(1, 3, 10).foreach { c =>
      val st = s"/tmp/scale_soak_r13/cont_state_x$c"
      val hp = new org.apache.hadoop.fs.Path(st)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
      graft.streaming.StreamingUpsert.containmentBatch(spark,
        (0 until c).map(rotated).reduce(_ unionByName _),
        "doc_id", "text", n = 3, tauPpm = 500000L, maxDf = 100L,
        basePath = st)
      println(s"[soak-r13] ---- containment ${c}x state ----")
      time(s"containment_delta_x$c") {
        graft.streaming.StreamingUpsert.containmentBatch(spark,
          deltaDocs, "doc_id", "text", n = 3, tauPpm = 500000L,
          maxDf = 100L, basePath = st)
      }
    }

    // ---- 3. streaming top-k: per-batch cost vs history depth -------
    def evBatch(b: Int): DataFrame =
      spark.range(0, 500000L).select(
        ($"id" % 100000L).as("g"),
        (($"id" * 37 + b * 1000003L) % 1000000007L).as("ord"),
        ($"id" + b * 500000L).as("rid"))
    Seq(1, 3, 10).foreach { c =>
      val st = s"/tmp/scale_soak_r13/topk_state_x$c"
      val hp = new org.apache.hadoop.fs.Path(st)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
      (0 until c).foreach { b =>
        graft.streaming.StreamingUpsert.topKStateBatch(spark, evBatch(b),
          Seq("g"), "ord", "rid", 3, b.toLong, st)
      }
      println(s"[soak-r13] ---- topk after $c prior batches ----")
      time(s"topk_batch_after_$c") {
        graft.streaming.StreamingUpsert.topKStateBatch(spark, evBatch(c),
          Seq("g"), "ord", "rid", 3, c.toLong, st)
      }
    }
    spark.stop()
  }
}
