package graft
package tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.search.Search

/** Before/after probe for the round-5 multi-field BM25 rewrite
  * (VERDICT r4 item 1): the retired per-field composition (each field
  * re-scans and re-shuffles the corpus through its own bm25 chain,
  * full_outer-joined) vs the shipped single-pass tagged explode.
  * Bench protocol: warmed noop-sink force, min of 3.
  */
object ProfileBm25 {

  /** The round-4 form, kept verbatim for measurement: one complete
    * bm25 chain (stats + df + tf = 3 corpus scans, 1 corpus shuffle)
    * PER FIELD, combined with a full_outer join chain.
    */
  private def perFieldMulti(docs: DataFrame, idCol: String,
                            fields: Seq[String],
                            queryToks: Seq[String]): DataFrame = {
    def one(textCol: String): DataFrame = {
      val toksAll = docs.select(col(idCol).as("id"),
        Search.analyze(col(textCol)).as("toks"))
      val stats = broadcast(toksAll.agg(
        count(lit(1)).as("n_docs"),
        sum(size($"toks")).cast("long").as("t_toks")))
      val toks = toksAll
        .select($"id", size($"toks").cast("long").as("dl"),
          explode($"toks").as("tok"))
        .filter($"tok".isin(queryToks: _*))
      val df_ = toks.select($"id", $"tok").distinct()
        .groupBy($"tok").agg(count(lit(1)).as("df"))
      val tf = toks.groupBy($"id", $"tok")
        .agg(count(lit(1)).as("tf"), max($"dl").as("dl"))
      tf.join(broadcast(df_), Seq("tok"))
        .crossJoin(stats)
        .withColumn("idf",
          log(($"n_docs".cast("double") + lit(1.0)) /
            ($"df".cast("double") + lit(0.5))))
        .withColumn("tfpart",
          (lit(22L) * $"tf" * $"t_toks").cast("double") /
            (lit(10L) * $"tf" * $"t_toks" + lit(3L) * $"t_toks" +
              lit(9L) * $"dl" * $"n_docs").cast("double"))
        .withColumn("contrib",
          floor($"idf" * $"tfpart" * lit(1e6)).cast("long"))
        .groupBy($"id").agg(sum($"contrib").as("score_fp"))
        .filter($"score_fp" > 0)
    }
    val perField = fields.map(f =>
      one(f).select($"id", $"score_fp".as(s"_s_$f")))
    val joined = perField.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val scores = fields.map(f => coalesce(col(s"_s_$f"), lit(0L)))
    joined.select($"id",
      (if (scores.size == 1) scores.head else greatest(scores: _*))
        .as("score_fp"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val fields = Seq("text", "lang", "source")
    val qts = Seq("the", "data", "model", "spark")

    def time(tag: String)(mk: => DataFrame): Unit = {
      def force(): Double = {
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      force() // warmup
      val ts = (1 to 3).map(_ => force())
      println(f"$tag%-28s min=${ts.min}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    time("per-field (r4 form)") {
      perFieldMulti(docs, "doc_id", fields, qts)
    }
    time("tagged single-pass (r5)") {
      Search.bm25MultiField(docs, "doc_id", fields, qts)
    }
    time("fuzzy bm25ClassicScores") {
      Search.bm25ClassicScores(docs, "doc_id", fields, "data modell sparc")
    }
    // round 6: the persisted BM25 statistics asset (VERDICT r5 item 4)
    // — build once, then repeat searches read only the index tables
    val t0 = System.nanoTime()
    Search.writeBm25Index(docs, "doc_id", fields,
      "profile_bm25_post", "profile_bm25_df", "profile_bm25_stats")
    println(f"bm25 index build             ${(System.nanoTime() - t0) / 1e9}%.3f s (once)")
    time("exact FROM INDEX (r6)") {
      Search.bm25MultiFieldFromIndex(spark, "profile_bm25_post",
        "profile_bm25_df", "profile_bm25_stats", fields, qts)
    }
    time("fuzzy FROM INDEX (r6)") {
      Search.bm25ClassicScoresFromIndex(spark, "profile_bm25_post",
        "profile_bm25_df", "profile_bm25_stats", fields,
        "data modell sparc")
    }
    Seq("profile_bm25_post", "profile_bm25_df", "profile_bm25_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
