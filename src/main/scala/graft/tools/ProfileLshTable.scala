package graft
package tools

import org.apache.spark.sql.DataFrame
import graft.ops.Dedup

/** Repeat-dedup probe for the round-5 persisted LSH asset tables
  * (VERDICT r4 item 3): inline [[Dedup.minhashLshPairs]] (re-shingles
  * and re-hashes the corpus every run) vs
  * [[Dedup.minhashLshPairsFromTable]] over assets written once by
  * [[Dedup.writeLshAssets]]. Bench protocol: warmed noop-sink force,
  * min of 3; the one-time asset write is timed separately since it is
  * amortized over every later run.
  */
object ProfileLshTable {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    def time(tag: String)(mk: => DataFrame): Unit = {
      def force(): Double = {
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      force() // warmup
      val ts = (1 to 3).map(_ => force())
      println(f"$tag%-28s min=${ts.min}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val t0 = System.nanoTime()
    Dedup.writeLshAssets(docs, "doc_id", "text", 3, 4, 2,
      "profile_lsh_sets", "profile_lsh_buckets")
    println(f"asset write (one-time)       ${(System.nanoTime() - t0) / 1e9}%.3f s")

    time("inline minhashLshPairs") {
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 2, tau = 0.5)
    }
    time("from persisted tables") {
      Dedup.minhashLshPairsFromTable(spark,
        "profile_lsh_sets", "profile_lsh_buckets", tau = 0.5)
    }

    // candidate GENERATION only (the stage the asset removes work
    // from): inline must tokenize + md5-hash the corpus into band
    // keys; the table path scans the narrow persisted index.
    import org.apache.spark.sql.functions.{col, size}
    time("candidates inline") {
      val sets = graft.ops.Materialize.Local(
        Dedup.shingleSets(docs, "doc_id", "text", 3)
          .filter(size(col("shs")) > 0))
      val b = graft.ops.Materialize.Local(
        Dedup.capBuckets(Dedup.minhashBuckets(sets, 4, 2),
          Dedup.defaultMaxBucket))
      b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }
    time("candidates from table") {
      val b = Dedup.capBuckets(spark.table("profile_lsh_buckets"),
        Dedup.defaultMaxBucket)
      b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }
    spark.sql("DROP TABLE IF EXISTS profile_lsh_sets")
    spark.sql("DROP TABLE IF EXISTS profile_lsh_buckets")
    spark.stop()
  }
}
