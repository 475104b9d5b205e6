package graft
package tools

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Storage + ranking-cost probe for the PQ tier (round 5): on-disk
  * parquet bytes of the same sf0.1 embedding corpus stored as raw
  * float vectors, int8 codes (q74), and PQ codes (q85), plus warmed
  * min-of-3 timings of brute exact vs raw-ADC vs IVF-PQ ranking.
  * Same writer settings for every variant (one output file).
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val p = Similarity.prepared(emb, "vec_id", "embedding")
    val cb = Similarity.pqCodebooks(p, m = 8, dims = 64, stride = 25L)

    def dirBytes(path: String): Long = {
      val it = Files.walk(java.nio.file.Paths.get(path)).iterator()
      var total = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.toString.endsWith(".parquet")) total += Files.size(f)
      }
      total
    }

    val base = Files.createTempDirectory("pq_storage").toString
    emb.select("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(s"$base/float32")
    Similarity.preparedInt8(p).select("vec_id", "codes").coalesce(1)
      .write.mode("overwrite").parquet(s"$base/int8")
    Similarity.pqEncode(p, cb, m = 8, dims = 64)
      .select(col("vec_id"),
        transform(col("codes"), c => c.cast("smallint")).as("codes"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$base/pq")
    Seq("float32", "int8", "pq").foreach { v =>
      println(f"$v%-8s ${dirBytes(s"$base/$v")}%,d bytes")
    }

    def time(tag: String)(mk: => DataFrame): Unit = {
      def force(): Double = {
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      force()
      val ts = (1 to 3).map(_ => force())
      println(f"$tag%-22s min=${ts.min}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val queries = p.filter(col("vec_id") < 5)
    val coarse = Similarity.strideCentroids(p, 25L)
    time("brute exact") {
      Similarity.knnBrute(p, queries, 10)
    }
    time("pq ADC (encode+rank)") {
      Similarity.knnPq(p, queries, cb, 8, 64, 10)
    }
    // the serve path: codes are a persisted index asset, per-query
    // cost is the codes scan + broadcast LUT join only
    val codes = Similarity.pqEncode(p, cb, 8, 64).localCheckpoint()
    time("pq ADC (codes ready)") {
      Similarity.knnPqOnCodes(codes, queries, cb, 8, 64, 10)
    }
    time("ivf-pq + rerank") {
      Similarity.knnIvfPqRerank(p, queries, coarse, cb, 8, 64, 10,
        nProbe = 8, shortlist = 50)
    }
    // round 6: the persisted IVF-PQ index (VERDICT r5 item 1) — build
    // once, then the serve path reads only (vec_id, cent_id, codes)
    val t0 = System.nanoTime()
    Similarity.writePqIndex(p, coarse, cb, 8, 64, "profile_pq_index")
    println(f"ivf-pq index build       ${(System.nanoTime() - t0) / 1e9}%.3f s (once)")
    time("ivf-pq + rerank ON INDEX") {
      Similarity.knnIvfPqRerankOnIndex(spark, "profile_pq_index", p,
        queries, coarse, cb, 8, 64, 10, nProbe = 8, shortlist = 50)
    }
    // round 6: trained vs stride-seed codebooks — raw-ADC recall of 10
    // exact neighbors per query (the q85/q93 audit, totalled)
    def recall(book: DataFrame): Long = {
      val exact = Similarity.knnBrute(p, queries, 10)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.knnPq(p, queries, book, 8, 64, 10)
        .select(col("query_id").as("a_q"), col("neighbor_id").as("a_n"))
      exact.join(approx,
          col("query_id") === col("a_q") && col("neighbor_id") === col("a_n"))
        .count()
    }
    println(s"raw-ADC recall/50: stride-seed=${recall(cb)} " +
      Seq(1, 2, 4).map(i => s"trained($i)=${recall(
        Similarity.pqCodebooksTrained(p, 8, 64, 25L, iters = i))}")
        .mkString(" "))
    spark.sql("DROP TABLE IF EXISTS profile_pq_index")
    spark.stop()
  }
}
