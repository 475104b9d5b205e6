package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, TextAnalysis}

/** Scratch profiling main for the minhash-LSH pipeline stages (not part
  * of the library surface).
  */
object ProfileQ23 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      println(f"[q23] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    time("docs_scan")(docs)
    time("toks")(docs.select($"doc_id", TextAnalysis.toks($"text").as("t")))
    time("shingles")(docs.select($"doc_id",
      TextAnalysis.shingles(TextAnalysis.toks($"text"), 3).as("sh")))
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .filter(size($"shs") > 0)
    time("sets")(sets)
    val sigs = Dedup.withMinhashSignature(sets, 8)
    time("sigs")(sigs)
    val bandCols = (0 until 4).map { b =>
      val parts = (0 until 2).map(r => col(s"sig${b * 2 + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", parts: _*)).as("bkey"))
    }
    val buckets = sigs
      .select($"doc_id", explode(array(bandCols: _*)).as("bb"))
      .select($"doc_id", $"bb.band".as("band"), $"bb.bkey".as("bkey"))
    time("buckets")(buckets)
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("cands")(cands)
    time("full_q23")(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 4, 2, 0.5))
    spark.stop()
  }
}
