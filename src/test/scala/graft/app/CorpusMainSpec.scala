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
      Set("doc_id", "n_tokens", "shard", "bin_id"))
  }
}
