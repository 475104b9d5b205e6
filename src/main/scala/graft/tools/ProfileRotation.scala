package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch recall audit for the OPQ-style signed-permutation rotation
  * ([[Similarity.rotate]]): runs q93's trained-codebook raw-ADC
  * protocol unrotated and under several rotation seeds, printing
  * recall@10 over the 5 gate queries — the measurement behind q106's
  * pinned seed. Not part of the library surface.
  */
object ProfileRotation {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.LocalSession.build("16")
    spark.sparkContext.setLogLevel("ERROR")

    val p0 = Similarity.prepared(
      graft.Tables.load(spark, sfDir, "embeddings"), "vec_id", "embedding")
      .localCheckpoint()

    def recall(p: DataFrame, label: String): Unit = {
      val cb = Similarity.pqCodebooksTrained(p, m = 8, dims = 64,
        stride = 25L, iters = 2)
      val qs = p.filter(col("vec_id") < 5)
      val exact = Similarity.knnBrute(p, qs, 10)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.knnPq(p, qs, cb, m = 8, dims = 64, k = 10)
        .select(col("query_id").as("a_q"), col("neighbor_id").as("a_n"))
      val found = exact.join(approx,
          col("query_id") === col("a_q") &&
            col("neighbor_id") === col("a_n"), "left")
        .agg(count(col("a_n")), count(lit(1))).head()
      println(s"[rot] $label recall ${found.getLong(0)}/${found.getLong(1)}")
    }

    recall(p0, "unrotated(q93)")
    Seq("rot1", "rot2", "rot3", "rot5", "rot7").foreach { seed =>
      recall(Similarity.rotate(p0, seed, 64).localCheckpoint(),
        s"seed=$seed")
    }

    // the q102 protocol (trained coarse + trained residual codebooks
    // + index + probe/three-term-ADC + re-rank) — does rotation still
    // help once residual encoding has removed most block structure?
    def residualRecall(p: DataFrame, label: String): Unit = {
      val coarse = Similarity.kmeansCentroids(p, stride = 25L, iters = 2)
      val rcb = Similarity.pqCodebooksTrained(
        Similarity.residualCorpus(p, coarse), m = 8, dims = 64,
        stride = 13L, iters = 2)
      val qs = p.filter(col("vec_id") < 5)
      val exact = Similarity.knnBrute(p, qs, 10)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.knnIvfPqResidualOnCodes(
          Similarity.pqIndexRowsResidual(p, coarse, rcb, 8, 64),
          qs, coarse, rcb, m = 8, dims = 64, k = 50, nProbe = 8)
        .select(col("query_id"), col("neighbor_id"))
      val rr = Similarity.rerankExact(approx, p, qs, 10)
        .select(col("query_id").as("a_q"), col("neighbor_id").as("a_n"))
      val found = exact.join(rr,
          col("query_id") === col("a_q") &&
            col("neighbor_id") === col("a_n"), "left")
        .agg(count(col("a_n")), count(lit(1))).head()
      println(s"[rot-res] $label recall ${found.getLong(0)}/${found.getLong(1)}")
    }
    residualRecall(p0, "unrotated(q102)")
    Seq("rot1", "rot3", "rot7").foreach { seed =>
      residualRecall(Similarity.rotate(p0, seed, 64).localCheckpoint(),
        s"seed=$seed")
    }
    spark.stop()
  }
}
