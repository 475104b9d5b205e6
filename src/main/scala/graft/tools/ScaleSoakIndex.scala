package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Similarity
import graft.search.Search

/** Scaling soak for the round-6 persisted-index serve paths: derive
  * 3x and 10x corpora from the sf0.1 tables (rotated copies —
  * distinct content, same statistics) and, at each scale, time the
  * one-time index BUILD against the per-query SERVE cost:
  *
  *  - IVF-PQ: `writePqIndex` (build, linear in corpus) vs
  *    `knnIvfPqRerankOnIndex` (serve). The stride keeps list size
  *    CONSTANT as the corpus grows (lists scale with the corpus), so
  *    the probed row count — nProbe x list size — is scale-invariant:
  *    near-flat serve time against a linearly growing build is the
  *    measured form of "the probe restriction cuts scanned rows to
  *    nProbe/nLists". Brute exact is timed alongside as the linear
  *    contrast.
  *  - BM25: `writeBm25Index` (build, linear) vs
  *    `bm25MultiFieldFromIndex` (serve: token-pruned postings scan)
  *    against the inline `bm25Search` (corpus scan per query).
  *
  * Writes to /tmp + the session warehouse only.
  */
object ScaleSoakIndex {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embBase = Tables.load(spark, sfDir, "embeddings")
    val docBase = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")

    // embedding copy k: components rotated by k positions (norm
    // preserved, distinct vector), id offset
    def embRotated(k: Int): DataFrame = {
      val e = $"embedding"
      val n = size(e)
      val shift = lit(k) % greatest(n, lit(1))
      embBase.select(($"vec_id" + lit(k * 10000000L)).as("vec_id"),
        when(n > 1, concat(slice(e, shift + 1, n - shift),
          slice(e, lit(1), shift))).otherwise(e).as("embedding"))
    }
    def docRotated(k: Int): DataFrame = {
      val t = split($"text", " ")
      val n = size(t)
      val shift = lit(7 * k) % greatest(n, lit(1))
      docBase.select(($"doc_id" + lit(k * 10000000L)).as("doc_id"),
        when(n > 1, concat_ws(" ",
          concat(slice(t, shift + 1, n - shift), slice(t, lit(1), shift))))
          .otherwise($"text").as("text"))
    }
    def materialize(df: DataFrame, path: String): DataFrame = {
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

    def time(name: String)(f: => DataFrame): Double = {
      f.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[soak-index] $name%-28s $s%8.3f s")
      s
    }
    def timeUnit(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[soak-index] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s (build, once)")
    }

    Seq(1, 3, 10).foreach { c =>
      val emb = materialize(
        (0 until c).map(embRotated).reduce(_ unionByName _),
        s"/tmp/scale_soak_index/emb_x$c")
      val docs = materialize(
        (0 until c).map(docRotated).reduce(_ unionByName _),
        s"/tmp/scale_soak_index/docs_x$c")
      println(s"[soak-index] ---- ${c}x (${emb.count()} vecs, " +
        s"${docs.count()} docs) ----")

      val p = Similarity.prepared(emb, "vec_id", "embedding")
      val queries = p.filter($"vec_id" < 5)
      // production sizing for BOTH quantizers (VERDICT r6 #1 + the
      // round-7 re-soak finding): nLists ≈ √n trained on a
      // hash-sample (coarse assign = n × √n, O(n^1.5)) AND ksub held
      // CONSTANT (encode = n × m × ksub, linear — a fixed stride
      // made ksub ∝ n and the ENCODE was the real quadratic term:
      // 27 s at 10× survived the √n coarse fix until ksub was
      // pinned). List size grows as √n, so serve scans nProbe × √n
      // rows — the FAISS build/serve tradeoff, not a flaw.
      val n = emb.count()
      val nLists = math.max(4, math.sqrt(n.toDouble).round.toInt)
      val cb = Similarity.pqCodebooksForCorpus(p, m = 8, dims = 64,
        ksub = 64)
      println(s"[soak-index] nLists_x$c = $nLists, ksub = 64 (n = $n)")
      var coarse: org.apache.spark.sql.DataFrame = null
      timeUnit(s"ann_coarse_train_x$c") {
        coarse = Similarity.coarseForCorpus(p, nLists,
          samplePermille = 100, iters = 2)
      }
      time(s"ann_brute_exact_x$c")(Similarity.knnBrute(p, queries, 10))
      timeUnit(s"ann_index_build_x$c")(
        Similarity.writePqIndex(p, coarse, cb, 8, 64, s"soak_pq_idx_x$c"))
      time(s"ann_serve_on_index_x$c")(
        Similarity.knnIvfPqRerankOnIndex(spark, s"soak_pq_idx_x$c", p,
          queries, coarse, cb, 8, 64, 10, nProbe = 8, shortlist = 50))

      // streaming-state serve (VERDICT r6 #2): the retired path paid
      // a full .distinct() of ALL accumulated batch dirs per query;
      // the compacted path scores the bucketed table + one delta dir
      // (with a deliberate table∕delta duplicate batch to exercise
      // the max-merge) and must stay flat as state accumulates.
      val stBase = s"/tmp/scale_soak_index/state_x$c"
      val stTbl = s"soak_state_idx_x$c"
      val stPath = new org.apache.hadoop.fs.Path(stBase)
      val stFs = stPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (stFs.exists(stPath)) stFs.delete(stPath, true)
      spark.sql(s"DROP TABLE IF EXISTS $stTbl")
      (0 until 4).foreach { i =>
        Similarity.pqIndexRows(p.filter($"vec_id" % 4 === i), coarse, cb, 8, 64)
          .write.mode("overwrite").parquet(s"$stBase/index/batch=$i")
      }
      time(s"ann_serve_state_old_x$c")(
        Similarity.knnIvfPqOnCodes(
          graft.streaming.StreamingUpsert.pqIndexFromState(spark, stBase),
          queries, coarse, cb, 8, 64, 10, nProbe = 8))
      timeUnit(s"ann_state_compact_x$c")(
        graft.streaming.StreamingUpsert.compactPqIndexState(spark, stBase, stTbl))
      // a post-compaction delta that re-delivers an already-compacted
      // slice — the worst case for the merge
      Similarity.pqIndexRows(p.filter($"vec_id" % 4 === 3), coarse, cb, 8, 64)
        .write.mode("overwrite").parquet(s"$stBase/index/batch=4")
      time(s"ann_serve_state_compacted_x$c")(
        graft.streaming.StreamingUpsert.pqIndexServe(spark, stBase, stTbl,
          queries, coarse, cb, 8, 64, 10, nProbe = 8))

      val toks = Seq("spark", "table", "window")
      time(s"bm25_inline_x$c")(
        Search.bm25Search(docs, "doc_id", "text", toks))
      timeUnit(s"bm25_index_build_x$c")(
        Search.writeBm25Index(docs, "doc_id", Seq("text"),
          s"soak_bm25_post_x$c", s"soak_bm25_df_x$c", s"soak_bm25_st_x$c"))
      time(s"bm25_serve_on_index_x$c")(
        Search.bm25MultiFieldFromIndex(spark, s"soak_bm25_post_x$c",
          s"soak_bm25_df_x$c", s"soak_bm25_st_x$c", Seq("text"), toks))
    }
    Seq(1, 3, 10).foreach { c =>
      Seq(s"soak_pq_idx_x$c", s"soak_state_idx_x$c", s"soak_bm25_post_x$c",
        s"soak_bm25_df_x$c", s"soak_bm25_st_x$c").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
    spark.stop()
  }
}
