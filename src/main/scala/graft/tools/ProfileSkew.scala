package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup

/** Skew soak for the LSH candidate path (not part of the library
  * surface): plants a 2000-copy boilerplate cohort in the sf corpus —
  * one band bucket per band holds the whole cohort, the degenerate
  * web-crawl shape — and measures minhashLshPairs with the maxBucket
  * cap on vs off, plus the lshBucketStats audit. Results recorded in
  * PROFILE.md.
  */
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val boiler = "subscribe to our newsletter for the latest updates " +
      "and exclusive offers delivered straight to your inbox every week"
    val hot = spark.range(2000)
      .select(($"id" + 1000000L).as("doc_id"), lit(boiler).as("text"))
    val skewed = docs.unionByName(hot).localCheckpoint()
    println(s"[skew] corpus rows = ${skewed.count()}")

    val st = Dedup.lshBucketStats(skewed, "doc_id", "text", 3, 4, 2,
      Dedup.defaultMaxBucket).head()
    println(s"[skew] audit @cap=${Dedup.defaultMaxBucket}: " +
      s"n_buckets=${st.getAs[Long]("n_buckets")} " +
      s"dropped=${st.getAs[Long]("n_dropped_buckets")} " +
      s"docs_in_dropped=${st.getAs[Long]("n_docs_in_dropped")}")

    def run(name: String, maxBucket: Long): Unit = {
      val t0 = System.nanoTime()
      val n = Dedup.minhashLshPairs(skewed, "doc_id", "text",
        3, 4, 2, 0.5, maxBucket).count()
      println(f"[skew] $name%-16s pairs=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    run(s"capped(${Dedup.defaultMaxBucket})", Dedup.defaultMaxBucket)
    run("uncapped", Long.MaxValue)
    spark.stop()
  }
}
