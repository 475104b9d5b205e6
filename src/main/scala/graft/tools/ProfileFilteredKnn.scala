package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Isolated profile for the filtered IVF-PQ serve (q139): the
  * pre-filter semi-join's serve cost next to the unfiltered serve and
  * the filtered brute force, at two selectivities. Scratch tool.
  */
object ProfileFilteredKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")

    def times(name: String, runs: Int = 5)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save()
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[fknn] $name%-28s min ${ts.head}%.3f  med ${ts(ts.size / 2)}%.3f")
    }

    val p = Similarity.prepared(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding")
    val qs = p.filter(col("vec_id") < 5)
    val cb = Similarity.pqCodebooks(p, m = 8, dims = 64, stride = 25L)
    val coarse = Similarity.strideCentroids(p, 25L)
    Similarity.writePqIndex(p, coarse, cb, 8, 64, "prof_fknn_index")

    times("unfiltered serve") {
      Similarity.knnIvfPqRerankOnIndex(spark, "prof_fknn_index", p, qs,
        coarse, cb, 8, 64, k = 10, nProbe = 8, shortlist = 50)
    }
    for ((label, mod) <- Seq(("filtered 2/3", 3), ("filtered 1/10", 10))) {
      val allowed = p.filter(col("vec_id") % mod =!= 0).select(col("vec_id"))
      times(s"$label serve") {
        Similarity.knnIvfPqRerankFiltered(spark, "prof_fknn_index", p, qs,
          coarse, cb, 8, 64, k = 10, nProbe = 8, shortlist = 50, allowed)
      }
      times(s"$label brute") {
        Similarity.knnBrute(
          p.join(allowed, Seq("vec_id"), "left_semi"), qs, 10)
      }
    }
    spark.stop()
  }
}
