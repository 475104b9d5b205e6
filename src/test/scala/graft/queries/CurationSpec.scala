package graft.queries

import graft.SparkSpec

/** Intent-level invariants of the q267 curation capstone — the oracle
  * gate proves exact equality with the replayed SQL; these pins state
  * WHAT the composition must do, so an oracle edit that weakened a
  * stage (with the SQL dutifully weakened in lockstep) still fails
  * loudly here.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // the two most expensive faces are collected ONCE and shared by
  // every test that compares against them (round-18 review: the
  // first spelling re-ran the full q292 funnel three times and q267
  // twice per suite run)
  private lazy val q267Out = OpsQueries.queries(
    "q267_curation_capstone")(spark, "/root/testdata/sf0.001").collect()
  private lazy val q292Out = OpsQueries.queries(
    "q292_decontaminated_capstone")(
    spark, "/root/testdata/sf0.001").collect()

  test("q267: spam dropped, per-source budgets respected, keepers unique per cluster") {
    val out = q267Out
    assert(out.nonEmpty)
    // stage 1: every spam variant (+60000000 ids) must be gone
    assert(out.forall(_.getAs[Long]("doc_id") < 60000000L),
      "a spam variant survived the classifier gate")
    // stage 3: at most one survivor per near-dup cluster
    val clusters = out.map(_.getAs[Long]("cluster_id"))
    assert(clusters.distinct.length === clusters.length,
      "two docs from one cluster survived keep-best")
    // stage 4: every source's selected cost fits its budget, and
    // cum_cost is consistent with the per-source (score desc, id)
    // prefix order
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("cost")).sum <= 1200L,
        s"source $src over budget")
      val ordered = rows.sortBy(r =>
        (-r.getAs[Long]("score_ppm"), r.getAs[Long]("doc_id")))
      val cums = ordered.scanLeft(0L)(_ + _.getAs[Long]("cost")).drop(1)
      assert(ordered.map(_.getAs[Long]("cum_cost")).toSeq === cums.toSeq,
        s"source $src cum_cost inconsistent")
    }
    // the cut is real: fewer docs than the clean corpus
    val nDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(out.length < nDocs, "the budget cut selected everything")
  }

  test("q292: a verbatim eval-leaked doc that survives every OTHER gate is dropped HERE") {
    val dir = "/root/testdata/sf0.001"
    val base = q267Out
    val decon = q292Out
    // the planted leak: every 17th clean doc re-enters the frozen
    // eval set VERBATIM. At least one such doc must survive the
    // classifier (it IS clean), the LM filter (fluent), keep-best
    // dedup (unique within train) AND the budget in the
    // un-decontaminated capstone — otherwise this test is vacuous.
    // cost >= 3 ⇔ at least one 3-shingle exists.
    val leaked = base.filter(r => r.getAs[Long]("doc_id") % 17 == 0 &&
      r.getAs[Long]("doc_id") < 60000000L && r.getAs[Long]("cost") >= 3L)
    assert(leaked.nonEmpty,
      "fixture no longer plants a leak that survives the other gates")
    // ...and the decontaminated capstone must spend nothing on ANY
    // verbatim-leaked doc: its eval copy shares its whole shingle
    // set, so containment is exactly 10^6 >= the 800000 gate
    val survivedLeaks = decon.filter(r =>
      r.getAs[Long]("doc_id") % 17 == 0 &&
        r.getAs[Long]("doc_id") < 60000000L &&
        r.getAs[Long]("cost") >= 3L)
    assert(survivedLeaks.isEmpty,
      s"verbatim eval-leaked docs survived decontamination: " +
        survivedLeaks.map(_.getAs[Long]("doc_id")).mkString(", "))
    // the stage only REMOVES docs relative to q267 before the budget
    // re-ranks: every decontaminated survivor was a surv3 member, so
    // none may carry an id q267's surv3 could not have had
    assert(decon.forall(_.getAs[Long]("doc_id") < 60000000L),
      "a spam variant appeared after the decontamination stage")
  }

  test("q296 maintained decont capstone == q292 inline (every stage from state)") {
    val dir = "/root/testdata/sf0.001"
    val inline = q292Out.map(_.toSeq).toSet
    val maintained = OpsQueries.queries("q296_decontaminated_maintained")(
      spark, dir).collect().map(_.toSeq).toSet
    assert(inline.nonEmpty)
    assert(maintained === inline,
      "the state-served decontaminated funnel diverged from the inline one")
  }

  test("q297 BPE-priced capstone: budgets respected in BPE tokens, cost >= whitespace cost") {
    val dir = "/root/testdata/sf0.001"
    val out = OpsQueries.queries("q297_bpe_priced_capstone")(
      spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("doc_id") < 60000000L),
      "a spam variant survived the classifier gate")
    val clusters = out.map(_.getAs[Long]("cluster_id"))
    assert(clusters.distinct.length === clusters.length,
      "two docs from one cluster survived keep-best")
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("cost")).sum <= 1200L,
        s"source $src over its BPE-token budget")
    }
    // BPE segmentation never produces fewer symbols than words (every
    // word yields >= 1 symbol), so each selected doc's BPE cost must
    // be >= its whitespace cost in q267's pricing
    val wsCost = q267Out
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cost")).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      wsCost.get(id).foreach(ws =>
        assert(r.getAs[Long]("cost") >= ws,
          s"doc $id priced fewer BPE tokens than whitespace tokens"))
    }
  }

  test("q298 eval-asset decont == q292 inline; q299 BPE epochs: over-mass repeats within budget") {
    val dir = "/root/testdata/sf0.001"
    val inline = q292Out.map(_.toSeq).toSet
    val served = OpsQueries.queries("q298_decontaminated_eval_asset")(
      spark, dir).collect().map(_.toSeq).toSet
    assert(served === inline,
      "the asset-served eval sets changed the decontamination decision")
    val ep = OpsQueries.queries("q299_bpe_epochs_capstone")(
      spark, dir).collect()
    assert(ep.nonEmpty)
    assert(ep.forall(_.getAs[Long]("doc_id") < 60000000L))
    // the total is over-mass by construction: some source repeats
    assert(ep.map(_.getAs[Long]("epoch")).max >= 2L,
      "no source repeated — the over-mass fixture lost its teeth")
    // spend never exceeds the exact split's total
    assert(ep.map(_.getAs[Long]("cost")).sum <= 120000L)
  }

  test("q276 mixture capstone: spam dropped, temperature budgets respected, Σbudgets <= total") {
    val out = OpsQueries.queries("q276_mixture_curation")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("doc_id") < 60000000L),
      "a spam variant survived the classifier gate")
    val clusters = out.map(_.getAs[Long]("cluster_id"))
    assert(clusters.distinct.length === clusters.length,
      "two docs from one cluster survived keep-best")
    // the selected per-source costs together never exceed the total
    // budget (the temperature split's floor under-allocates, never
    // over)
    assert(out.map(_.getAs[Long]("cost")).sum <= 8000L,
      "selection exceeds the total mixture budget")
    // per-source prefix consistency (same check as q267's stage 4)
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val ordered = rows.sortBy(r =>
        (-r.getAs[Long]("score_ppm"), r.getAs[Long]("doc_id")))
      val cums = ordered.scanLeft(0L)(_ + _.getAs[Long]("cost")).drop(1)
      assert(ordered.map(_.getAs[Long]("cum_cost")).toSeq === cums.toSeq,
        s"source $src cum_cost inconsistent")
    }
  }

  test("q277 calibrated-gate capstone: the served threshold gate keeps NO spam and is q279-identical") {
    val a = OpsQueries.queries("q277_calibrated_capstone")(
      spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[Long]("doc_id") < 60000000L),
      "a spam variant survived the calibrated gate")
    // the served form (q279: persisted weights + persisted threshold)
    // decides identically — training and calibration are deterministic
    val b = OpsQueries.queries("q279_calibrated_serve")(
      spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toSeq).toSet === b.map(_.toSeq).toSet)
  }

  test("q284 over-mass capstone: epochs repeat, spend within budgets, inline == maintained") {
    val a = OpsQueries.queries("q284_mixture_epochs_capstone")(
      spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[Long]("doc_id") < 60000000L),
      "a spam variant survived the classifier gate")
    // 40k over the tiny post-curation corpus: repetition must occur
    assert(a.map(_.getAs[Long]("epoch")).max > 1L,
      "the over-mass capstone never repeated a document")
    assert(a.map(_.getAs[Long]("cost")).sum <= 40000L,
      "selection exceeds the total mixture budget")
    // every non-final epoch takes the WHOLE source: a doc present at
    // epoch e > 1 must also be present at every epoch below it
    val byDoc = a.groupBy(r =>
      (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    byDoc.foreach { case ((src, id), rows) =>
      val eps = rows.map(_.getAs[Long]("epoch")).sorted
      assert(eps.toSeq === (1L to eps.max).toSeq,
        s"doc $id of $src skips an epoch: $eps")
    }
    // the maintained composition decides identically
    val b = OpsQueries.queries("q285_mixture_epochs_maintained")(
      spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toSeq).toSet === b.map(_.toSeq).toSet)
  }

  test("q300 full funnel: eval leaks dropped, spend in BPE tokens within the split, over-mass repeats") {
    val dir = "/root/testdata/sf0.001"
    val out = OpsQueries.queries("q300_full_funnel")(spark, dir).collect()
    assert(out.nonEmpty)
    // stage 1 (calibrated gate): every spam variant gone
    assert(out.forall(_.getAs[Long]("doc_id") < 60000000L),
      "a spam variant survived the calibrated gate")
    // stage 4 (decontamination): no verbatim eval-leaked doc with an
    // existing 3-shingle may be selected — its frozen eval copy
    // shares its whole shingle set, containment exactly 10^6.
    // Derived from the corpus (>= 3 whitespace tokens <=> at least
    // one 3-shingle) — a FIXTURE-SCALE pin, not a general law: the
    // operator only flags docs with at least one rare shingle
    // (union df <= the maxDf=100 cap), which holds for every leaked
    // doc at sf0.001; a far more repetitive corpus could legally let
    // an all-common-shingle doc through (closing-wave review).
    val flaggable = spark.read.parquet(s"$dir/documents.parquet")
      .where("doc_id % 17 = 0 AND " +
        "size(split(trim(text), '\\\\s+')) >= 3 AND trim(text) <> ''")
      .select($"doc_id").as[Long].collect().toSet
    assert(flaggable.nonEmpty, "the eval-leak fixture lost its teeth")
    val survivedLeaks =
      out.map(_.getAs[Long]("doc_id")).filter(flaggable)
    assert(survivedLeaks.isEmpty,
      s"verbatim eval-leaked docs survived the full funnel: " +
        survivedLeaks.distinct.mkString(", "))
    // stages 5-6 (BPE epochs mixture): the 120000-BPE-token total is
    // over-mass at this scale, so some source repeats, and the spend
    // never exceeds the exact largest-remainder split's total
    assert(out.map(_.getAs[Long]("epoch")).max >= 2L,
      "no source repeated — the over-mass total lost its teeth")
    assert(out.map(_.getAs[Long]("cost")).sum <= 120000L)
    // a doc present at epoch e > 1 is present at every epoch below
    // it (non-final epochs take the whole source)
    out.groupBy(r => (r.getAs[String]("source"),
        r.getAs[Long]("doc_id")))
      .foreach { case ((src, id), rows) =>
        val eps = rows.map(_.getAs[Long]("epoch")).sorted
        assert(eps === (1L to eps.max).toSeq,
          s"doc $id of $src skips an epoch: $eps")
      }
  }

  test("q286 ensemble gate: a kept doc is top-half for SOME scorer; inline == served (q288)") {
    val a = OpsQueries.queries("q286_ensemble_quality")(
      spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    // intent: kept <=> max bucket >= 5, and the max is the max
    a.foreach { r =>
      val bm = r.getAs[Long]("b_margin"); val bf = r.getAs[Long]("b_fluency")
      assert(r.getAs[Long]("b_ens") === math.max(bm, bf))
      assert(r.getAs[Boolean]("kept") === (math.max(bm, bf) >= 5L))
    }
    // the gate discriminates: both decisions occur
    assert(a.exists(_.getAs[Boolean]("kept")) &&
      a.exists(!_.getAs[Boolean]("kept")))
    val b = OpsQueries.queries("q288_ensemble_serve")(
      spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toSeq).toSet === b.map(_.toSeq).toSet)
  }
}
