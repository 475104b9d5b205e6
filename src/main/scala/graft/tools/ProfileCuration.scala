package graft.tools

import org.apache.spark.sql.functions._

/** Round-15 capstone breakdown: which of q267's four stages dominates
  * the end-to-end curation cost at sf0.1 (the ProfileMultimodal
  * discipline — per-stage cold costs next to the composed run, so the
  * next optimization round knows where to aim).
  */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    def timed(w: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile-curation] $w%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s ($r rows)")
    }

    // stage 1 alone: classifier train + predict + keep-clean join
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source", $"text").localCheckpoint()
    val markers = array(lit("buy"), lit("click"), lit("free"))
    val tk = graft.ops.TextAnalysis.toks($"text")
    val corp = docs.select($"doc_id", $"source",
        lit("clean").as("label"), $"text")
      .unionByName(docs.select(($"doc_id" + 60000000L).as("doc_id"),
        $"source", lit("spam").as("label"),
        array_join(transform(tk, (x, i) =>
          when(pmod(i, lit(5)) === 0,
            element_at(markers,
              (pmod(floor((i + lit(1)) / lit(5)).cast("long"), lit(3)) +
                lit(1)).cast("int"))).otherwise(x)), " ").as("text")))
      .localCheckpoint()
    val clf = graft.ops.Classify
    val counts = clf.classTokenCounts(
      corp.filter(graft.ops.Sessions.sampleBucket($"doc_id") < 300L),
      "label", "text")
    val surv1 = corp.join(
        clf.predict(corp, "doc_id", "text", clf.tokenWeights(counts),
          clf.baseRates(counts))
          .filter($"predicted" === "clean").select($"doc_id"),
        Seq("doc_id"))
      .select($"doc_id", $"source", $"text")
    timed("1. classifier gate")(surv1.count())
    val s1 = surv1.localCheckpoint()

    val lm = graft.ops.LangModel
    val lmref = docs.select($"doc_id", $"text")
      .filter(graft.ops.Sessions.sampleBucket($"doc_id") < 300L)
    val surv2 = s1.join(
      lm.filterFluent(lm.scoreDocs(s1, "doc_id", "text",
          lm.bigramModel(lmref, "text"), lm.unigramCounts(lmref, "text")),
        33000L, 200000L).select($"doc_id"), Seq("doc_id"))
    timed("2. LM fluency filter")(surv2.count())
    val s2 = surv2.localCheckpoint()

    val clusters = graft.ops.Dedup.duplicateClusters(
      graft.ops.Dedup.minhashLshPairs(s2, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 2, tau = 0.5))
      .select("doc_id", "cluster_id")
    val nd = size(array_distinct(tk)).cast("long")
    val nt = size(tk).cast("long")
    val ksc = s2.select($"doc_id", $"source",
      when(nt === 0L, 0L)
        .otherwise(graft.functions.Fns.exactPpm(nd, nt)).as("score_ppm"),
      greatest(nt, lit(1L)).as("cost"))
    val surv3 = graft.ops.CleanCorpus.keepBestInCluster(ksc, "doc_id",
      "score_ppm", clusters)
    timed("3. keep-best dedup")(surv3.count())
    val s3 = surv3.localCheckpoint()

    timed("4. per-domain budget")(
      graft.ops.Prep.selectUnderBudgetByGroup(s3, "source", "doc_id",
        "score_ppm", "cost", budgetPerGroup = 1200L).count())

    timed("composed q267 (cold)")(
      graft.queries.OpsQueries.queries("q267_curation_capstone")(
        spark, dir).count())
    spark.stop()
  }
}
