package graft.ops

import graft.SparkSpec

/** Cross-corpus decontamination: bipartite-only candidates, the two
  * decision rules, the df cap, and the drop face.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def trainDf = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // dup of 1
    (3L, "completely different words entirely unrelated content here"),
    (4L, "short text")).toDF("doc_id", "text")

  private def testDf = Seq(
    (101L, "the quick brown fox jumps over the lazy dog today"), // = 1,2
    (102L, "fox jumps over the lazy"),                  // quoted in 1,2
    (103L, "never seen anywhere zq1 zq2 zq3 zq4 zq5")). // unseen
    toDF("test_id", "text")

  test("contaminationPairs: verbatim copy scores 1e6; quote contained; unseen matches nothing; bipartite only") {
    val got = Decontaminate.contaminationPairs(trainDf, "doc_id", "text",
        testDf, "test_id", "text", n = 3, tauPpm = 800000L, maxDf = 100L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    // the verbatim test doc is contained in BOTH train dups at 1e6;
    // the quote's 3 shingles all appear in docs 1/2
    assert(got === Map(
      (1L, 101L) -> 1000000L, (2L, 101L) -> 1000000L,
      (1L, 102L) -> 1000000L, (2L, 102L) -> 1000000L))
    // bipartite: train docs 1 and 2 are identical but must NEVER pair
    // with each other here (that is the dedup family's decision)
    assert(!got.keySet.exists { case (a, b) => b < 100L || a > 100L })
  }

  test("sharedNgramPairs counts exact overlaps; decontaminate drops exactly the flagged docs") {
    val pairs = Decontaminate.sharedNgramPairs(trainDf, "doc_id", "text",
      testDf, "test_id", "text", n = 3, maxDf = 100L)
    val shared = pairs.as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(shared((1L, 101L)) === 8L) // 10 toks -> 8 shingles, all shared
    assert(shared((1L, 102L)) === 3L) // the 5-token quote's 3 shingles
    assert(!shared.keySet.exists(_._2 == 103L), "unseen doc matched")
    val kept = Decontaminate.decontaminate(trainDf, "doc_id", pairs)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L), "exactly the flagged train docs drop")
  }

  test("df cap: a pair sharing ONLY hot shingles is missed (the documented trade)") {
    // shingle df over the union = 4 (docs 1, 2, 101, 102 chains) —
    // capping at 3 removes the fox shingles from blocking, so doc 102
    // (whose every shingle is hot) matches nothing
    val got = Decontaminate.contaminationPairs(trainDf, "doc_id", "text",
        testDf, "test_id", "text", n = 3, tauPpm = 1L, maxDf = 3L)
      .select($"test_id").as[Long].collect().toSet
    assert(!got.contains(102L), "hot-only pair must be capped away")
  }
}
