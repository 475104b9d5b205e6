package graft.tools

import org.apache.spark.sql.functions._
import graft.queries.OpsQueries

/** Round-14: batch hybrid serving amortization (q245's claim) — N
  * hybrid queries through hybridRrfBatchFromIndex vs N separate
  * hybridRrfAnnFromIndex calls. The batch form pays ONE postings scan
  * and ONE probes→codes→ADC pass for the whole set; the per-call form
  * pays them N times. Signal: batch wall-clock grows sub-linearly in
  * N while per-call grows ~linearly, so the per-query cost of the
  * batch form falls with N.
  */
object ProfileBatchHybrid {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")

    // build the shared assets once (q238/q245's tables)
    OpsQueries.q238(spark, dir).write.mode("overwrite")
      .format("noop").save()
    val (post, dfT, st) = (s"graft_hyb_post_$sfx", s"graft_hyb_df_$sfx",
      s"graft_hyb_stats_$sfx")
    val idxT = s"graft_pq_srv104_$sfx"
    val coarse = spark.table(s"graft_pq_srv104_coarse_$sfx")
    val cb = spark.table(s"graft_pq_srv104_cb_$sfx")
    val p = graft.ops.Similarity.prepared(
      graft.Tables.load(spark, dir, "embeddings"), "vec_id", "embedding")
      .localCheckpoint()
    val toks = Seq("spark", "table", "window")

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prof-bh] $name%-36s $s%8.3f s")
      s
    }
    for (nq <- Seq(1, 4, 16)) {
      val ids = (0 until nq).map(_.toLong * 3 + 1)
      val qToks = ids.flatMap(q => toks.map(q -> _))
        .toDF("query_id", "tok")
      time(f"batch    N=$nq%2d (one call)") {
        graft.search.Search.hybridRrfBatchFromIndex(spark, post, dfT,
            st, "text", qToks, idxT, p,
            p.filter(col("vec_id").isin(ids: _*)), coarse, cb,
            m = 8, dims = 64, n = 50, k = 10, nProbe = 8,
            shortlist = 100)
          .write.mode("overwrite").format("noop").save()
      }
      time(f"per-call N=$nq%2d ($nq calls)") {
        ids.foreach { q =>
          graft.search.Search.hybridRrfAnnFromIndex(spark, post, dfT,
              st, "text", toks, idxT, p,
              p.filter(col("vec_id") === q), coarse, cb,
              m = 8, dims = 64, n = 50, k = 10, nProbe = 8,
              shortlist = 100)
            .write.mode("overwrite").format("noop").save()
        }
      }
    }
    spark.stop()
  }
}
