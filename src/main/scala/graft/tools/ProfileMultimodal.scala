package graft.tools

import org.apache.spark.sql.functions._

/** Round-14: which chain dominates the q237 cross-modality capstone
  * at sf0.1 (VERDICT r13 Next #7's PROFILE ask). The corpus is the
  * gate's: every sf0.1 document as a binary blob + the fixture sets,
  * so the text SimHash chain sees ~60k docs while the media chains
  * see fixture-sized inputs — the expectation is text-dominated, with
  * the CC fixpoint second.
  */
object ProfileMultimodal {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof-mm] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows $n)")
    }
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bin"))
    val c = graft.ops.Materialize.Local(docs.select(col("doc_id"),
      col("bin"), graft.ops.Multimodal.sniffFormat(col("bin")).as("_fmt")))
    time("text chain (sniff+utf8 -> simhash -> pairs)") {
      graft.ops.Dedup.hammingPairs(
        graft.ops.Dedup.simhashFingerprints(
          graft.ops.CleanCorpus.textRoute(c), "doc_id", "text"),
        3).count()
    }
    time("full capstone (4 chains + union + CC)") {
      graft.ops.CleanCorpus.multimodalNearDupClusters(c.drop("_fmt")).count()
    }
    spark.stop()
  }
}
