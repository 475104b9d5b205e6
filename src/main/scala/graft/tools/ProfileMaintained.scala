package graft.tools

/** Round-16 stage breakdown of the MAINTAINED curation capstone
  * (q269) at sf0.1 — which stage dominates the maintained form
  * (VERDICT r15 Next #7's PROFILE note). Replays q269's exact
  * choreography with per-stage timers: the two count-state builds
  * (4 batches each), the two stateless gates from the served models,
  * the dedup state folds (4 × nearDupBatch + cluster fold), and the
  * final keep-best + budget stage.
  */
object ProfileMaintained {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile-maintained] $what%-34s " +
        f"${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // q269's body, stage-timed (kept in sync with OpsQueries.q269 —
    // this is a profiling replica, the gate entry is the contract)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val su = graft.streaming.StreamingUpsert
    val clf = graft.ops.Classify
    val lm = graft.ops.LangModel
    val mat = graft.ops.Materialize.Local
    val base = java.nio.file.Files
      .createTempDirectory("profile_maintained").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source", $"text")
    val markers = array(lit("buy"), lit("click"), lit("free"))
    val toks = graft.ops.TextAnalysis.toks($"text")
    val corp = mat(docs
      .select($"doc_id", $"source", lit("clean").as("label"), $"text")
      .unionByName(docs.select(($"doc_id" + 60000000L).as("doc_id"),
        $"source", lit("spam").as("label"),
        array_join(transform(toks, (x, i) =>
          when(pmod(i, lit(5)) === 0,
            element_at(markers,
              (pmod(floor((i + lit(1)) / lit(5)).cast("long"), lit(3)) +
                lit(1)).cast("int")))
            .otherwise(x)), " ").as("text"))))
    val ref = corp.filter(graft.ops.Sessions.sampleBucket($"doc_id") < 300L)
    def cslice(i: Int) = ref.filter(pmod($"doc_id", lit(3)) === i)
    timed("1. clf count state (4 batches)") {
      su.clfCountsBatch(spark, cslice(0), "doc_id", "label", "text",
        s"$base/clf", 0L)
      su.clfCountsBatch(spark, cslice(1).unionByName(
        cslice(0).filter(pmod($"doc_id", lit(5)) === 0)),
        "doc_id", "label", "text", s"$base/clf", 1L)
      su.clfCountsBatch(spark, cslice(2), "doc_id", "label", "text",
        s"$base/clf", 2L)
      su.clfCountsBatch(spark, cslice(2), "doc_id", "label", "text",
        s"$base/clf", 2L)
    }
    val (wts, rts) = su.clfModelFromState(spark, s"$base/clf")
    val lref = docs.select($"doc_id", $"text")
      .filter(graft.ops.Sessions.sampleBucket($"doc_id") < 300L)
    def lslice(i: Int) = lref.filter(pmod($"doc_id", lit(3)) === i)
    timed("2. LM count state (4 batches)") {
      su.lmCountsBatch(spark, lslice(0), "doc_id", "text", s"$base/lm", 0L)
      su.lmCountsBatch(spark, lslice(1).unionByName(
        lslice(0).filter(pmod($"doc_id", lit(5)) === 0)),
        "doc_id", "text", s"$base/lm", 1L)
      su.lmCountsBatch(spark, lslice(2), "doc_id", "text", s"$base/lm", 2L)
      su.lmCountsBatch(spark, lslice(2), "doc_id", "text", s"$base/lm", 2L)
    }
    val (uni, model) = su.lmModelFromState(spark, s"$base/lm")
    val surv2 = timed("3. gates (predict + LM score)") {
      val keepIds = clf.predict(corp, "doc_id", "text", wts, rts)
        .filter($"predicted" === "clean").select($"doc_id")
      val surv1 = corp.join(keepIds, Seq("doc_id"))
        .select($"doc_id", $"source", $"text")
      val fluentIds = lm.filterFluent(
          lm.scoreDocs(surv1, "doc_id", "text", model, uni),
          minFluencyPpm = 33000L, maxOovPpm = 200000L)
        .select($"doc_id")
      mat(surv1.join(fluentIds, Seq("doc_id")))
    }
    def dslice(i: Int) = surv2.filter(pmod($"doc_id", lit(3)) === i)
    // round 17: the cluster fold is DEFERRED (VERDICT r16 Next #3) —
    // batches only accumulate pair deltas; ONE fold runs before serve
    timed("4a. near-dup pair state (4 batches)") {
      Seq(0, 1, 2, 2).foreach { i =>
        su.nearDupBatch(spark, dslice(i), "doc_id", "text",
          n = 3, bands = 4, rowsPerBand = 2, tau = 0.5, s"$base/dedup")
      }
    }
    timed("4b. deferred cluster fold (ONE)") {
      su.clusterFoldFromPairs(spark, s"$base/dedup", s"$base/clusters", 0L)
    }
    timed("5. keep-best + per-domain budget") {
      val clusters = su.clustersFromState(spark, s"$base/clusters")
        .select("doc_id", "cluster_id")
      val tk = graft.ops.TextAnalysis.toks(col("text"))
      val nd = size(array_distinct(tk)).cast("long")
      val nt = size(tk).cast("long")
      val scored = surv2.select(col("doc_id"), col("source"),
        when(nt === 0L, 0L)
          .otherwise(graft.functions.Fns.exactPpm(nd, nt)).as("score_ppm"),
        greatest(nt, lit(1L)).as("cost"))
      val surv3 = graft.ops.CleanCorpus.keepBestInCluster(scored,
        "doc_id", "score_ppm", clusters)
      graft.ops.Prep.selectUnderBudgetByGroup(surv3, "source", "doc_id",
        "score_ppm", "cost", budgetPerGroup = 1200L).count()
    }
    spark.stop()
  }
}
