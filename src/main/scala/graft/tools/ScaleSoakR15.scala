package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-15 soak: the model-based-curation tier at 1x/3x/10x corpus
  * scale plus the streaming-LM state protocol in state depth.
  *
  *   1. LM train + corpus score/filter (the q256 shape) — both passes
  *      are explode+join+aggregate chains, so the expectation is
  *      LINEAR in the corpus; a super-linear trend would indicate a
  *      lost map-side combine or a broadcast flipping to shuffle
  *      pathologically.
  *   2. Classifier train + predict (the q258 shape) — same
  *      expectation, one token join instead of two.
  *   3. Budget selection exact vs pruned (q260 vs q261) at a FIXED
  *      budget as the corpus grows — the exact form's global sort
  *      grows with the corpus while the pruned form's window input
  *      stays ~budget-sized; the gap is the operator's scale claim.
  *   4. lmCountsBatch per-batch cost as the count state deepens —
  *      the fold reads one vocabulary-sized predecessor version per
  *      asset, so per-batch cost must stay flat in batch count.
  *
  * Synthetic corpus: 60-token docs over a shared 4000-token zipf-ish
  * vocabulary (tok = w<(i*p) % 4000> for varying stride p), so the
  * unigram/bigram tables stay vocabulary-sized as the corpus grows —
  * the production shape (model << corpus).
  */
object ScaleSoakR15 {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def docs(n: Long): DataFrame =
      spark.range(0L, n).as[Long].map { i =>
        val stride = (i % 7) + 1
        val toks = (0 until 60).map(t => s"w${(i + t * stride) % 4000}")
        (i, toks.mkString(" "))
      }.toDF("doc_id", "text").localCheckpoint()

    def timed(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[soak-r15] $what%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s ($rows rows)")
    }

    val lm = graft.ops.LangModel
    for (n <- Seq(30000L, 90000L, 300000L)) {
      val d = docs(n)
      val ref = d.filter(graft.ops.Sessions.sampleBucket($"doc_id") < 300L)
      timed(s"1. lm train+score n=$n") {
        val uni = lm.unigramCounts(ref, "text")
        val model = lm.bigramModel(ref, "text")
        lm.filterFluent(lm.scoreDocs(d, "doc_id", "text", model, uni),
          33000L, 200000L).count()
      }
      val labeled = d.withColumn("label",
        when(pmod($"doc_id", lit(2)) === 0, "a").otherwise("b"))
      timed(s"2. classifier train+predict n=$n") {
        val counts = graft.ops.Classify.classTokenCounts(
          labeled.filter(graft.ops.Sessions.sampleBucket($"doc_id") < 300L),
          "label", "text")
        graft.ops.Classify.predict(d, "doc_id", "text",
          graft.ops.Classify.tokenWeights(counts),
          graft.ops.Classify.baseRates(counts)).count()
      }
      val scored = d.select($"doc_id",
        (pmod(conv(substring(md5(concat($"doc_id".cast("string"), lit("#s"))), 1, 8), 16, 10)
          .cast("long"), lit(1000000L))).as("score_ppm"),
        lit(60L).as("cost")).localCheckpoint()
      timed(s"3a. budget select EXACT n=$n") {
        graft.ops.Prep.selectUnderBudget(scored, "doc_id", "score_ppm",
          "cost", budget = 120000L).count()
      }
      timed(s"3b. budget select PRUNED n=$n") {
        graft.ops.Prep.selectUnderBudgetPruned(scored, "doc_id",
          "score_ppm", "cost", budget = 120000L).count()
      }
      scored.unpersist()
      d.unpersist()
    }

    // ---- 4. lmCountsBatch per-batch cost in state depth -------------
    val base = java.nio.file.Files
      .createTempDirectory("soak_r15_lm_state").toString
    val batchRows = 30000L
    println(s"[soak-r15] 4. lmCountsBatch: 8 x $batchRows docs, " +
      "per-batch seconds as the count state deepens")
    (0 until 8).foreach { b =>
      val batch = spark.range(b * batchRows, (b + 1) * batchRows)
        .as[Long].map { i =>
          val stride = (i % 7) + 1
          val toks = (0 until 60).map(t => s"w${(i + t * stride) % 4000}")
          (i, toks.mkString(" "))
        }.toDF("doc_id", "text").localCheckpoint()
      val t0 = System.nanoTime()
      graft.streaming.StreamingUpsert.lmCountsBatch(spark, batch,
        "doc_id", "text", base, b.toLong)
      println(f"[soak-r15] batch $b%2d (state ${b * batchRows}%7d docs) " +
        f"${(System.nanoTime() - t0) / 1e9}%8.3f s")
      batch.unpersist()
    }
    val (uni, model) = graft.streaming.StreamingUpsert
      .lmModelFromState(spark, base)
    println(s"[soak-r15] final state: vocab=${uni.count()}, " +
      s"bigrams=${model.count()}")
    spark.stop()
  }
}
