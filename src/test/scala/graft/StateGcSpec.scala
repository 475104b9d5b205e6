package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.StateGc.isStale

/** The warehouse-GC classification rule, pinned against the REAL
  * name zoo observed in the round-18 stale warehouse (355 entries;
  * see PROFILE.md round 18). The rule must delete exactly the
  * orphans — older-version tokens and pre-versioning state paths —
  * and must never touch an unversioned data asset.
  */
class StateGcSpec extends AnyFunSuite {

  private val v = graft.queries.OpsQueries.TrainDefV

  test("current-version state and model tables are live") {
    assert(!isStale(s"graft_q269_state_${v}__root_testdata_sf0_1", v))
    assert(!isStale(s"graft_clf_w_${v}__root_testdata_sf0_01", v))
    assert(!isStale(s"graft_decont_eval_${v}__root_testdata_sf0_01", v))
    assert(!isStale(s"graft_ens_edges_${v}__root_testdata_sf0_1", v))
  }

  test("older version tokens are stale regardless of family") {
    assert(isStale("graft_q269_state_d15__root_testdata_sf0_1", v))
    assert(isStale("graft_clf_w_d2__root_testdata_sf0_01", v))
    assert(isStale("graft_lm_model_d9__root_testdata_sf0_001", v))
  }

  test("legacy pre-versioning state paths are stale") {
    assert(isStale("graft_q269_state__root_testdata_sf0_1", v))
    assert(isStale("graft_q280_state__root_testdata_sf0_1", v))
  }

  test("unversioned data assets are never touched") {
    for (
      n <- Seq(
        "bloom_orders_month__root_testdata_sf0_01",
        "bloomidx_orderkey__root_testdata_sf0_01_meta",
        "bpe_merges__root_testdata_sf0_1",
        "compact_z_lineitem__root_testdata_sf0_01",
        "driftref_sketch__root_testdata_sf0_01_files",
        "graft_bm25_cpost113__root_testdata_sf0_01",
        "graft_bm25c_post__root_testdata_sf0_01",
        "zorder_lineitem__root_testdata_sf0_001_zreg",
        "sumbench_lineitem__root_testdata_sf0_1",
        "part_lineitem__root_testdata_sf0_01")
    ) assert(!isStale(n, v), n)
  }

  test("a dataset suffix cannot fake a version token (review catch)") {
    // the version token only counts at the `_dNN__` sfx boundary a
    // versioned writer produces; `d<digits>` INSIDE a dataset path
    // (/mnt/d5/sf1 -> sfx _mnt_d5_sf1) must never classify a live
    // asset stale — the bench auto-GC would otherwise delete every
    // asset keyed by such a path on every run
    assert(!isStale("bpe_merges__mnt_d5_sf0_1", v))
    assert(!isStale(s"graft_clf_w_${v}__mnt_d5_sf0_1", v))
    assert(!isStale("graft_bm25_post__root_testdata_sf0_01", v))
    // ...while a real stale token at the boundary still classifies
    // even when the path also carries a d-segment
    assert(isStale("graft_x_d15__root_d16_data", v))
  }

  test("pre-versioning MODEL tables of versioned families are stale (review catch)") {
    // every current writer of these families versions its name; an
    // unversioned instance is pre-d16 garbage by construction
    for (
      n <- Seq(
        "graft_clf_w__root_testdata_sf0_01",
        "graft_clf_r__root_testdata_sf0_1",
        "graft_clf_thr__root_testdata_sf0_01",
        "graft_lm_uni__root_testdata_sf0_001",
        "graft_lm_model__root_testdata_sf0_01",
        "graft_ens_edges__root_testdata_sf0_1",
        "graft_decont_eval__root_testdata_sf0_01")
    ) assert(isStale(n, v), n)
    // a family PREFIX match must not bleed onto longer names
    assert(!isStale("graft_clf_word_counts__root_testdata_sf0_01", v))
  }
}
