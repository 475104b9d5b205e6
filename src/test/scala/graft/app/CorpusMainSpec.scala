package graft.app

import java.nio.file.Files
import graft.SparkSpec

/** End-to-end smoke of the training-corpus pipeline: the stage counts
  * must form a monotone funnel and the packed output must be readable
  * and non-trivial.
  */
class CorpusMainSpec extends SparkSpec {

  test("corpus pipeline runs end-to-end with a monotone funnel") {
    val out = Files.createTempDirectory("graft_corpus_spec").toString
    val r = CorpusMain.run(spark, "/root/testdata/sf0.001", out)
    assert(r.nDocs > 0L)
    assert(r.nCleaned > 0L && r.nCleaned <= r.nDocs)
    assert(r.nDespanned > 0L && r.nDespanned <= r.nCleaned)
    assert(r.nCapped <= r.nDespanned)
    assert(r.nSampled <= r.nCapped && r.nSampled > 0L)
    assert(r.nBins > 0L)
    val packed = spark.read.parquet(s"$out/corpus_bins")
    assert(packed.count() === r.nSampled)
    assert(packed.columns.toSet ===
      Set("doc_id", "shuffle_rank", "n_tokens", "shard", "bin_id"))
    // the shuffle rank is a dense permutation of the sampled docs
    val ranks = packed.select("shuffle_rank")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ranks === (1L to r.nSampled))
  }

  test("corpus pipeline is end-to-end deterministic across runs") {
    // The composed pipeline (clean -> span dedup -> cap -> sample ->
    // pack) must produce bit-identical packed output on every run —
    // the whole-pipeline form of the per-operator determinism
    // contracts (md5 buckets, exact-int arithmetic, explicit
    // tie-breaks everywhere).
    val out1 = Files.createTempDirectory("graft_corpus_det1").toString
    val out2 = Files.createTempDirectory("graft_corpus_det2").toString
    val r1 = CorpusMain.run(spark, "/root/testdata/sf0.001", out1)
    val r2 = CorpusMain.run(spark, "/root/testdata/sf0.001", out2)
    assert(r1 === r2)
    val a = spark.read.parquet(s"$out1/corpus_bins")
      .collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$out2/corpus_bins")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
