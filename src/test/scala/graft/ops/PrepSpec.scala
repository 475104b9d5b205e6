package graft.ops

import graft.SparkSpec

class PrepSpec extends SparkSpec {
  import spark.implicits._

  test("packBins: bins respect the token budget cumulatively, per shard") {
    val docs = Seq(
      (0L, "a b c"), (8L, "d e"), (16L, "f g h i"), // shard 0: 3,2,4 toks
      (1L, "x y z w v")).toDF("doc_id", "text")     // shard 1
    val got = Prep.packBins(docs, "doc_id", "text",
      budgetTokens = 5L, numShards = 8)
      .orderBy("doc_id").collect()
    // shard 0 cumulative: 3 -> bin 0, 5 -> bin 0, 9 -> bin 1
    assert(got.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bin_id"))).toSeq
      === Seq((0L, 0L), (1L, 0L), (8L, 0L), (16L, 1L)))
  }

  test("packBins: empty-prefix and oversized-document edge cases") {
    val docs = Seq(
      (0L, ""),                                  // cum=0 -> bin 0 (guard)
      (8L, (1 to 12).map(_ => "w").mkString(" ")), // 12 > budget: straddles
      (16L, "a b")).toDF("doc_id", "text")       // cum 14 -> bin 2
    val got = Prep.packBins(docs, "doc_id", "text",
      budgetTokens = 5L, numShards = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bin_id"))).toSeq
    assert(got === Seq((0L, 0L), (8L, 2L), (16L, 2L)))
  }

  test("chunkDocs: sliding windows with stride, short tail, no empty docs") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, " "))
      .toDF("doc_id", "text")
    val got = Prep.chunkDocs(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    // starts at tokens 1,4,7,10 -> lengths 4,4,4,1
    assert(got.map(_.getAs[Long]("doc_id")).forall(_ == 1L))
    assert(got.map(_.getAs[Long]("n_chunk_tokens")).toSeq === Seq(4L, 4L, 4L, 1L))
    assert(got.map(_.getAs[String]("chunk_fp")).distinct.length === 4)
  }
}
