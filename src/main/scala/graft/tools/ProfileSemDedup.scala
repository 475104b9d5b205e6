package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Isolated profile for the SemDeDup candidate economics (q150/q160):
  * on a synthetic corpus far larger than the 500-vector test table,
  * report the COMPARE VOLUME (pairs actually scored) of the
  * cluster-scoped operator against the all-pairs baseline, and the
  * wall across a corpus scale-up. The recorded evidence is pair
  * counts — the quantity the clustering exists to shrink — not
  * toy-scale walls (the q123/q146 evidence discipline). Scratch
  * tool, not library surface.
  */
object ProfileSemDedup {

  /** Deterministic synthetic embeddings: dims md5-derived components
    * in [0, 1) with CLUSTER STRUCTURE (vectors lean toward one of
    * `nGroups` md5-derived directions) so nearest-centroid clusters
    * are non-degenerate and epsilon-pairs exist, as in a real
    * embedding space.
    */
  private def synth(spark: org.apache.spark.sql.SparkSession,
                    n: Long, dims: Int, nGroups: Int): DataFrame = {
    val comp = (d: Int) =>
      (conv(substring(md5(concat(col("id"), lit(s"|$d"))), 1, 4), 16, 10)
        .cast("long") % 1000L).cast("double") / lit(1000.0)
    val grp = pmod(col("id"), lit(nGroups.toLong))
    val gcomp = (d: Int) =>
      (conv(substring(md5(concat(lit("g"), grp, lit(s"|$d"))), 1, 4), 16, 10)
        .cast("long") % 1000L).cast("double") / lit(1000.0)
    spark.range(n).select(col("id").as("vec_id"),
      array((0 until dims).map(d =>
        ((gcomp(d) * lit(3.0) + comp(d)) / lit(4.0)).cast("float")): _*)
        .as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dims = 64

    def profile(n: Long): Unit = {
      val p = Similarity.prepared(synth(spark, n, dims, 40),
        "vec_id", "embedding")
      val nLists = math.max(4, math.sqrt(n.toDouble).toInt)
      val t0 = System.nanoTime()
      val cents = Similarity.coarseForCorpus(p, nLists = nLists,
        samplePermille = 100, iters = 2)
      val asg = Similarity.assignClusters(p, cents).localCheckpoint()
      val sizes = asg.groupBy($"cent_id").agg(count(lit(1)).as("c"))
      // compare volume = sum over clusters of C(c, 2) vs n(n-1)/2
      val row = sizes.agg(
        sum(expr("c * (c - 1) DIV 2")).as("pairs"),
        max($"c").as("maxc"), count(lit(1)).as("lists")).head()
      val res = Similarity.semDedup(p, cents, tau = 0.9)
      val kept = res.filter($"is_kept").count()
      val wall = (System.nanoTime() - t0) / 1e9
      val allPairs = n * (n - 1) / 2
      val pairs = row.getAs[Long]("pairs")
      println(f"[semdedup] n=$n%-7d lists=${row.getAs[Long]("lists")}%-5d " +
        f"maxCluster=${row.getAs[Long]("maxc")}%-6d " +
        f"pairsScored=$pairs%-12d allPairs=$allPairs%-14d " +
        f"fraction=${pairs.toDouble / allPairs}%.4f kept=$kept%-7d " +
        f"wall=$wall%.1fs")
    }

    profile(20000L)
    profile(80000L)
    spark.stop()
  }
}
