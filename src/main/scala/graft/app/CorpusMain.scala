package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{CleanCorpus, Dedup, Prep, Sessions}

/** End-to-end TRAINING-CORPUS pipeline entry point — the LLM-data
  * counterpart of [[Main]]: compose the oracle-verified corpus
  * operators into the C4/RefinedWeb-shaped preparation flow:
  *
  *   load documents → language + quality filter → exact dedup →
  *   minhash-LSH near-dup cluster resolution (CleanCorpus.clean) →
  *   corpus-wide span dedup (repeated-block removal) → per-language
  *   count cap → deterministic sample → deterministic training-order
  *   shuffle → sequence packing → write packed corpus.
  *
  * One command:
  *   sbt "runMain graft.app.CorpusMain [sfDir] [outDir]"
  *
  * Every stage is an operator with its own oracle query (q50, q77,
  * q71, q35, q87, q52); this object only composes them and reports
  * stage counts (CorpusMainSpec asserts the monotone funnel).
  */
object CorpusMain {

  final case class Report(
      nDocs: Long, nCleaned: Long, nDespanned: Long, nCapped: Long,
      nSampled: Long, nBins: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String): Report = {
    val docs = Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()
    // lang+quality gate, exact dedup, near-dup keeper resolution
    val cleaned = CleanCorpus.clean(docs, "doc_id", "text",
      langs = Seq("en"), minQuality = 0.7,
      n = 3, bands = 4, rowsPerBand = 2, tau = 0.5)
    // residual boilerplate: repeated 8-token blocks survive only at
    // their first corpus-wide occurrence; fully-boilerplate docs drop
    val despanned = Dedup.dropRepeatedSpans(cleaned, "doc_id", "text",
        spanTokens = 8, minRepeat = 2L)
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("text_dedup").as("text"))
      .join(cleaned.select(col("doc_id"), col("lang_pred")), Seq("doc_id"))
    // one hot domain/language must not dominate the mix
    val capped = Sessions.capPerKey(despanned, "lang_pred", "doc_id",
      maxPerKey = 100000)
    // stable 90% training split (md5 bucket — reproducible anywhere)
    val sampled = Sessions.deterministicSample(capped, "doc_id",
      permille = 900)
    // reproducible training-order shuffle BEFORE packing: bins are
    // filled in permuted order, so each bin mixes sources instead of
    // replaying ingest order (salt pins the permutation; bump it for
    // a fresh epoch order)
    val shuffled = Sessions.shuffleRank(sampled, "doc_id",
      salt = "graft-corpus-v1")
    // token-budget packing for the trainer, sharded/ordered by the
    // shuffle rank; doc_id joined back for lineage
    val packed = Prep.packBins(shuffled, "shuffle_rank", "text",
        budgetTokens = 4096L, numShards = 8)
      .join(shuffled.select(col("doc_id"), col("shuffle_rank")),
        Seq("shuffle_rank"))
    packed.write.mode("overwrite").parquet(s"$outDir/corpus_bins")
    val persisted = spark.read.parquet(s"$outDir/corpus_bins")
    Report(
      nDocs = nDocs,
      nCleaned = cleaned.count(),
      nDespanned = despanned.count(),
      nCapped = capped.count(),
      nSampled = sampled.count(),
      nBins = persisted.select(col("shard"), col("bin_id"))
        .distinct().count())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.drop(1).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_corpus").toString)
    val spark = graft.LocalSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, sfDir, outDir)
    println(s"[corpus] out=$outDir")
    println(s"[corpus] docs=${r.nDocs} cleaned=${r.nCleaned} " +
      s"despanned=${r.nDespanned} capped=${r.nCapped} " +
      s"sampled=${r.nSampled} bins=${r.nBins}")
    spark.stop()
  }
}
