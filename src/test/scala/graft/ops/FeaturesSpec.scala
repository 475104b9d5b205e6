package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The embedding-model plug-point contract (VERDICT r11 Next #8):
  * downstream pipelines must be a pure function of a provider's
  * (vec_id, embedding) output — so swapping in a learned model when
  * weights become available is configuration, not surgery.
  */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  // 12 distinguishable PNGs + 3 undecodable text blobs
  private def corpus: DataFrame = {
    val pngs = (0 until 12).map { i =>
      (i.toLong, Media.pngFixture(6, 4)((x, y) =>
        ((x * 40 + i * 17) % 256, (y * 60 + i * 5) % 256, (i * 31) % 256)))
    }
    val texts = (100 until 103).map(i =>
      (i.toLong, s"not an image $i".getBytes("UTF-8")))
    (pngs ++ texts).toDF("doc_id", "bin")
  }

  test("LumaHistogram fails closed; Stub featurizes everything; both honor the schema") {
    val luma = Features.LumaHistogram.features(corpus, "doc_id", "bin")
    val stub = Features.Stub.features(corpus, "doc_id", "bin")
    for (df <- Seq(luma, stub)) {
      assert(df.columns.toSeq === Seq("vec_id", "embedding"))
      assert(df.schema("vec_id").dataType.typeName === "long")
      assert(df.schema("embedding").dataType.simpleString === "array<double>")
    }
    // fail-closed: the text blobs must NOT enter the embedding space
    assert(luma.count() === 12L)
    assert(luma.filter($"vec_id" >= 100L).isEmpty)
    // the stub cannot fail closed (a hash needs no codec) — the
    // documented reason it stays a plumbing seam, never a pipeline
    assert(stub.count() === 15L)
  }

  test("downstream is provider-agnostic: equal features => identical semDedup and kNN") {
    // two DIFFERENT code paths yielding the same feature rows: the
    // provider itself, and the same provider behind a repartition +
    // column rebuild (a stand-in for 'another model with identical
    // outputs' — what swapping weights amounts to)
    val pA = Features.LumaHistogram
    val pB = new FeatureProvider {
      override def features(docs: DataFrame, idCol: String,
                            binCol: String): DataFrame =
        pA.features(docs.repartition(7), idCol, binCol)
          .select($"vec_id",
            transform($"embedding", e => e).as("embedding"))
    }
    def downstream(p: FeatureProvider): (Seq[Row], Seq[Row]) = {
      val prep = Similarity.prepared(
        p.features(corpus, "doc_id", "bin"), "vec_id", "embedding")
      val dedup = Similarity.semDedup(prep,
        Similarity.strideCentroids(prep, 4L), tau = 0.9)
      val knn = Similarity.knnBrute(prep, prep.filter($"vec_id" < 2), 3)
      (dedup.collect().toSeq.sortBy(_.toString),
        knn.collect().toSeq.sortBy(_.toString))
    }
    val (d1, k1) = downstream(pA)
    val (d2, k2) = downstream(pB)
    assert(d1 === d2, "semDedup must depend only on the provider's output")
    assert(k1 === k2, "kNN must depend only on the provider's output")
  }
}
