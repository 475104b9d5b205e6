package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scaling soak: derive 3x and 10x document corpora from the sf0.1
  * table (token-rotated copies — distinct shingle sets, same length
  * and vocabulary statistics, so near-dup structure does not explode
  * artificially) and time the sketch-based dedup family at 1x/3x/10x.
  * Near-linear growth here is the measured form of the "survives a
  * 100x scale-up" claim: every operator is candidate-generation-first,
  * so cost tracks corpus size, not its square. Writes to /tmp only.
  */
object ScaleSoak {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text")

    // copy k: tokens rotated by 7k positions, id offset by k*10M —
    // deterministic, distinct from the original for any doc with
    // more than one distinct token
    def rotated(k: Int): DataFrame = {
      val t = split($"text", " ")
      val n = size(t)
      val shift = lit(7 * k) % greatest(n, lit(1))
      base.select(
        ($"doc_id" + lit(k * 10000000L)).as("doc_id"),
        when(n > 1, concat_ws(" ",
          concat(slice(t, shift + 1, n - shift), slice(t, lit(1), shift))))
          .otherwise($"text").as("text"))
    }

    def corpus(copies: Int): String = {
      val path = s"/tmp/scale_soak/docs_x$copies"
      val df = (0 until copies).map(rotated).reduce(_ unionByName _)
      df.write.mode("overwrite").parquet(path)
      path
    }

    def time(name: String)(f: => DataFrame): Double = {
      f.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[soak] $name%-28s $s%8.3f s")
      s
    }

    Seq(1, 3, 10).foreach { c =>
      val dir = corpus(c)
      val docs = spark.read.parquet(dir)
      println(s"[soak] ---- ${c}x corpus (${docs.count()} docs) ----")
      time(s"minhash_lsh_x$c")(
        graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 4, 2, 0.5))
      time(s"simhash_x$c")(
        graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", 3))
      time(s"jaccard_exact_x$c")(
        graft.ops.Dedup.jaccardPairsExact(docs, "doc_id", "text", 3, 0.4))
      time(s"text_stats_x$c")(
        docs.select($"doc_id",
          graft.ops.TextAnalysis.textStats(
            graft.ops.TextAnalysis.toks($"text")).as("st")))
      time(s"span_dedup_x$c")(
        graft.ops.Dedup.dropRepeatedSpans(docs, "doc_id", "text", 8, 2L))
    }
    spark.stop()
  }
}
