package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.LocalSession
import graft.ops.Similarity

/** Recall ladder for the OPQ family on the gate corpus: raw trained-PQ
  * (q93 shape), signed-perm rotation (q106), TRAINED OPQ rotation
  * (q117) — all through the same raw-ADC top-10 audit vs brute force
  * in the index frame. Usage: runMain graft.tools.ProfileOpq SF_DIR
  */
object ProfileOpq {
  private def recall(p: DataFrame, cb: DataFrame, m: Int,
                     dims: Int): Long = {
    val qs = p.filter(col("vec_id") < 5)
    val exact = Similarity.knnBrute(p, qs, 10)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.knnPq(p, qs, cb, m, dims, 10)
      .select(col("query_id").as("a_q"), col("neighbor_id").as("a_n"))
    exact.join(approx,
        col("query_id") === col("a_q") && col("neighbor_id") === col("a_n"),
        "left_semi")
      .count()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark: SparkSession = LocalSession.build("8")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p0 = Similarity.prepared(emb, "vec_id", "embedding")

    // total squared reconstruction error Σ‖x − x̂‖² (quantized units²)
    def distortion(p: DataFrame, cb: DataFrame): Double = {
      val codes = Similarity.pqEncode(p, cb, 8, 64)
      val rec = Similarity.pqReconstruct(codes, cb)
      p.join(rec, "vec_id")
        .select(aggregate(zip_with(col("qv"), col("xh"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, v) => acc + v)
          .cast("double").as("d2"))
        .agg(sum(col("d2"))).collect()(0).getDouble(0)
    }

    val cbRaw = Similarity.pqCodebooksTrained(p0, 8, 64, 25L, 2)
    println(f"raw trained-PQ recall: ${recall(p0, cbRaw, 8, 64)}/50  dist=${distortion(p0, cbRaw)}%.3e")

    val pPerm = Similarity.rotate(p0, graft.queries.OpsQueries.rotationSeed, 64)
    val cbPerm = Similarity.pqCodebooksTrained(pPerm, 8, 64, 25L, 2)
    println(f"signed-perm (q106) recall: ${recall(pPerm, cbPerm, 8, 64)}/50  dist=${distortion(pPerm, cbPerm)}%.3e")

    for (opqIters <- Seq(1, 2, 3)) {
      val t0 = System.nanoTime()
      val rq = Similarity.opqRotationTrained(
        Similarity.opqTrainSample(pPerm, 4096), 8, 64, 25L,
        pqIters = 2, opqIters = opqIters)
      val pRot = Similarity.rotateDense(pPerm, rq)
      val cbRot = Similarity.pqCodebooksTrained(pRot, 8, 64, 25L, 2)
      val r = recall(pRot, cbRot, 8, 64)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"trained OPQ (opqIters=$opqIters) recall: $r/50  dist=${distortion(pRot, cbRot)}%.3e  ($sec%.1f s)")
      // orthogonality audit: max |RᵀR - I| in Q20 units
      val rqA = rq.map(_.toArray).toArray
      val rtr = Similarity.matmulQ20(rqA.transpose, rqA)
      val dev = (0 until 64).flatMap(i => (0 until 64).map(j =>
        math.abs(rtr(i)(j) - (if (i == j) 1L << 20 else 0L)))).max
      println(s"  max |R'R - I| = $dev Q20 units (${dev / math.pow(2, 20)})")
    }
    spark.stop()
  }
}
