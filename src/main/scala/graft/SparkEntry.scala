package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family lives in its own module under graft.queries /
  * graft.ops / graft.search; this object only aggregates their query +
  * oracle maps for the driver's verify/bench harnesses.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ OpsQueries.queries ++ RecipeQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ OpsQueries.oracles ++ RecipeQueries.oracles

  /** Headline subset timed by Bench at sf0.1 (keep it representative and
    * bounded — the full map runs in Verify at sf0.01).
    */
  def benchQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q03_join_revenue", "q04_star_join",
    "q07_window_topn", "q08_running_sum", "q10_distinct_agg",
    "q15_hourly_window",
    // LLM-pipeline representative: MinHash+LSH dedup over documents —
    // catches candidate-explosion regressions in the bench, not just
    // correctness (VERDICT r2 item 9).
    "q23_minhash_lsh",
    // ranked-search representative: fixed-point BM25 — catches
    // regressions in the corpus-stats/df broadcast shape (round 4).
    "q65_bm25_search",
    // span-dedup representative: explode + count-agg + join-back +
    // reassembly, the linear no-self-join dedup shape (round 4).
    "q77_span_dedup",
    // multi-field BM25: the single-pass tagged-explode shape (round 5
    // rewrite) — catches regressions back toward per-field corpus scans.
    "q69_bm25_classic",
    // iterative path: connected components (large-star/small-star) —
    // catches round-count / barrier regressions in the bench, not only
    // correctness (VERDICT r4 item 7).
    "q49_dup_clusters",
    // composed cleaning pipeline: exact dedup -> LSH -> CC -> filters;
    // regressions in composition order or materialization surface here.
    "q50_clean_corpus",
    // vector-index representative: PQ ADC ranking over codes +
    // broadcast LUTs — the first ANN family member in the bench
    // (round 5); catches regressions toward raw-vector ranking scans.
    "q85_pq_recall",
    // ANN bench split (VERDICT r6 #3): q94/q101 timed build +
    // brute-force baseline + serve in one conflated number, hiding
    // serve-path regressions. Now the SERVE paths are timed alone
    // (index/coarse/codebook tables built once in the untimed warmup;
    // timed runs pay only probes → bucketed codes join → ADC →
    // re-rank)...
    "q104_ivfpq_serve",
    // ...the residual (FAISS by_residual) serve path likewise — the
    // three-term ADC must stay broadcast-only; a regression toward
    // shuffling the cross/probe tables surfaces here as a cliff...
    "q105_ivfpq_residual_serve",
    // ...and the BUILD is timed alone (coarse assignment + PQ encode
    // + bucketed index write + list-population stats, every call).
    "q98_pq_index_stats",
    // rank/sort representative: bucketed two-phase global shuffle
    // rank — catches regressions toward a single-task global window.
    "q87_shuffle_rank",
    // runtime-filter representative: Bloom semi-join reduction — the
    // probe-side filter must stay under the exchange; a regression
    // toward shuffling the unreduced fact side surfaces here (round
    // 9). q124's z-order entry is deliberately NOT benched: it times
    // a layout WRITE (stage-and-swap table build), whose variance is
    // filesystem-dominated; LayoutSpec + PROFILE carry its numbers.
    "q123_bloom_join_reduce",
    // read-path serve face (round 10): manifest + per-file-bloom
    // pruned READS against assets prebuilt in the untimed warmup —
    // the q104/q105 precedent applied to the r9 layout tier, so a
    // regression in planning-time pruning cost surfaces in the bench
    // (the layout WRITE stays unbenched, as above).
    "q132_pruned_read_serve",
    // compute-reuse serve face (round 10): the materialized-aggregate
    // roll-up served from partials prebuilt in the untimed warmup —
    // the summary-sized replacement for the fact-table report
    // aggregate; a regression toward re-reading the base surfaces as
    // a cliff vs q01's fact-sized number.
    "q136_summary_serve",
    // data-quality suite (round 10): six checks fused into ONE
    // aggregate pass — the nightly ingestion gate; a regression
    // toward one-scan-per-check surfaces as a multiple of q01.
    "q147_validate",
    // graph join-economics face (round 10): degree-ordered triangle
    // counting — two equi-joins whose fan-out the orientation bounds;
    // a regression toward unordered wedges (or a cartesian) surfaces
    // as a cliff, which q49's aggregate-dominated CC would miss.
    "q151_triangles",
    // semantic-dedup face (round 10): cluster-scoped epsilon compare
    // over the embedding table — assignment broadcast + ONE cent_id
    // shuffle; a regression toward all-pairs scoring surfaces here.
    "q150_semdedup",
    // maintenance-path face (round 12, carried r10 #7): one small
    // append + one DELTA-SIZED summary refresh per repetition (the
    // entry REQUIREs delta cost in-plan); a regression toward
    // full-rebuild refresh shows here as a trend toward q01's
    // fact-scan cost instead of only failing at gate scale.
    "q179_summary_delta_refresh",
    // tokenizer-apply serve face (round 12): the 100 TB BPE pass —
    // merge table prebuilt in the untimed warmup, timed runs pay the
    // native per-token merge replay + doc reassembly only; a
    // regression toward the composed replace chain (or toward
    // retraining per call) surfaces here as a trend.
    "q202_bpe_apply_serve",
    // hybrid-retrieval serve face (round 13): BM25-from-index + brute
    // vector ranking fused by RRF — the postings/df/stats tables build
    // in the untimed warmup (catalog-existence guard), so timed runs
    // pay only the token-pruned index scan, the broadcast-query vector
    // scan and the n-bounded fusion; a regression toward re-tokenizing
    // the corpus per query surfaces here as a cliff.
    "q232_hybrid_rrf_serve",
    // fully index-served hybrid (round 14, VERDICT r13 #1): the vector
    // leg swaps knnBrute's per-query corpus scan for the persisted
    // IVF-PQ serve (probes → bucketed codes join → ADC shortlist →
    // exact re-rank of 100 rows). Benched NEXT TO q232 so the two
    // vector-leg economics stay directly comparable per round; a
    // regression toward a raw-vector ranking scan shows as q238
    // converging to q232's cost.
    "q238_hybrid_rrf_ann",
    // cross-modality dedup capstone (round 14, VERDICT r13 #7): the
    // most expensive composed shape in the suite — magic-sniff
    // routing, four fingerprint chains (SimHash / image dHash / audio
    // energy hash / GIF frame-set Jaccard), one pair union, one CC
    // fixpoint. Gate-only until now; benched so the cross-modality
    // decision cost is trended per round (PROFILE notes which chain
    // dominates).
    "q237_multimodal_neardup",
    // LM-curation face (round 15): train the reference bigram model +
    // score/filter the whole corpus — the corpus-sized pass is two
    // token-keyed joins and a doc aggregate; a regression toward
    // per-doc model scans (or a lost map-side combine on the train
    // counts) surfaces here.
    "q256_lm_fluency_filter",
    // budget-selection scale face (round 15): sketch cutoff + window
    // over the candidate stratum only; a regression toward the exact
    // form's corpus-wide single-partition sort surfaces here as a
    // cliff toward q260's cost shape.
    "q261_budget_select_pruned",
    // classifier serve face (round 15): weight tables prebuilt in the
    // untimed warmup (catalog-existence guard), timed runs pay one
    // token join + the classes-bounded per-doc window; a regression
    // toward retraining per call surfaces here as a trend.
    "q265_classifier_serve",
    // curation capstone (round 15): classifier gate -> LM filter ->
    // keep-best dedup -> per-domain budget, one composed pipeline —
    // benched so the end-to-end curation cost is trended per round
    // (each stage's own face isolates which one moved).
    "q267_curation_capstone",
    // served capstone (round 15): both models read from persisted
    // warehouse assets (built in the untimed warmup) — benched next
    // to q267 so retrain-vs-serve economics trend together; a
    // regression toward in-composition retraining shows as q268
    // converging to q267's cost.
    "q268_curation_serve",
    // MAINTAINED capstone (round 16, VERDICT r15 Next #1/#7): all
    // four stages from per-stage states — classifier counts, LM
    // counts, LSH pairs + cluster labels — so batch (q267) vs served
    // (q268) vs maintained (q269) economics trend as a TRIPLE. The
    // entry rebuilds its states per call (the full maintenance
    // choreography is the thing being priced); a regression in any
    // state fold's per-batch cost surfaces here as q269 drifting
    // away from q267 faster than the state count explains.
    "q269_curation_maintained",
    // maintained SERVE face (round 17, VERDICT r16 Next #2): the
    // states build ONCE in the untimed warmup (completion-marked);
    // timed runs pay model reads + the two stateless gates + label
    // reads + the budget window — the production read path. Benched
    // next to the triple so the quadruple (inline / served-models /
    // maintained-build / maintained-serve) trends together; a
    // regression toward refolding state per serve shows as q280
    // converging to q269's cost.
    "q280_curation_maintained_serve",
    // ensemble-gate serve face (round 17): classifier weights, LM
    // tables and both decile-edge arrays prebuilt in the untimed
    // warmup (TrainDefV catalog guards); timed runs pay the two
    // scoring passes + the map-only bucket folds + the max gate — a
    // regression toward re-deriving edges (two bottom-k sorts) or
    // retraining per call surfaces here as a trend.
    "q288_ensemble_serve",
    // decontaminated capstone (round 18, VERDICT r17 Next #1): the
    // COMPLETE production funnel — gate → LM → keep-best dedup →
    // eval-set decontamination → budget. Benched next to q267 so the
    // decont stage's marginal cost (two shingle passes + the
    // bipartite join against the eval-sized set) is trended per
    // round; a regression toward all-pairs candidates or an
    // unbroadcast eval side surfaces as q292 diverging from q267 by
    // more than that margin.
    "q292_decontaminated_capstone",
    // served mixture REPORT (round 18, VERDICT r17 Next #3): mass
    // partials + spend state build once in the untimed warmup
    // (_BUILT-marked); timed runs pay two sources-sized reads +
    // driver recipe arithmetic — the cheapest serve face in the
    // suite, benched so a regression toward re-running the selection
    // per report read (q291's cost shape) is unmissable.
    "q294_mixture_report_served",
    // the FULL production funnel (round-18 closing): calibrated gate
    // → LM → keep-best dedup → eval decontamination → BPE repricing
    // → over-mass epochs mixture, one query. Benched next to q292
    // (same funnel + decont, fixed whitespace budget) so the
    // marginal cost of the calibrated gate + BPE reprice + epochs
    // tail is trended per round; a regression in ANY stage's shape
    // (re-derived funnel past the surv4 seal, unbroadcast recipe,
    // unpartitioned epoch window) surfaces here as a trend break.
    "q300_full_funnel")
}
