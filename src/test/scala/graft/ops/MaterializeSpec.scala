package graft.ops

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** The Materializer seam must be semantics-free: every strategy
  * (local checkpoint, lazy cache, reliable checkpoint, none) produces
  * bit-identical results on the builders that use it — only cost and
  * fault-tolerance differ.
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val checkpointDir =
    java.nio.file.Files.createTempDirectory("graft-ckpt").toString

  private def strategies: Seq[(String, Materializer)] = Seq(
    "local" -> Materialize.Local,
    "cache" -> Materialize.Cache(),
    "reliable" -> Materialize.Reliable(checkpointDir),
    "off" -> Materialize.Off)

  private val docs = {
    val near = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (1L, near), (2L, near + " iota"), (3L, near),
      (4L, "completely different text with no overlap whatsoever here"),
      (5L, "another unrelated document about rivers and mountains ok"),
      (6L, near + " iota kappa")).toDF("doc_id", "text")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("minhashLshPairs is identical under every materializer") {
    val expected = sortedRows(Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 2, tau = 0.5))
    for ((name, m) <- strategies) {
      val got = sortedRows(Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 2, tau = 0.5, mat = m))
      assert(got === expected, s"strategy $name diverged")
    }
  }

  test("duplicateClusters is identical under every materializer") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L))
      .toDF("doc_a", "doc_b")
    val expected = sortedRows(Dedup.duplicateClusters(pairs))
    for ((name, m) <- strategies) {
      val got = sortedRows(Dedup.duplicateClusters(pairs, mat = m))
      assert(got === expected, s"strategy $name diverged")
    }
  }

  test("CleanCorpus.clean is identical under cache vs local checkpoint") {
    val corpus = (0L until 40L).map { i =>
      val base = s"the quick brown fox jumps over the lazy dog number ${i % 7}"
      (i, if (i % 2 == 0) base else s"$base extra tail $i")
    }.toDF("doc_id", "text")
    val ref = sortedRows(CleanCorpus.clean(corpus, "doc_id", "text",
      langs = Seq("en"), minQuality = 0.0, n = 3, bands = 4,
      rowsPerBand = 2, tau = 0.5))
    val got = sortedRows(CleanCorpus.clean(corpus, "doc_id", "text",
      langs = Seq("en"), minQuality = 0.0, n = 3, bands = 4,
      rowsPerBand = 2, tau = 0.5, mat = Materialize.Cache()))
    assert(got === ref)
  }
}
