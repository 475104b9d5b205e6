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

  test("q267: spam dropped, per-source budgets respected, keepers unique per cluster") {
    val out = OpsQueries.queries("q267_curation_capstone")(
      spark, "/root/testdata/sf0.001").collect()
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
}
