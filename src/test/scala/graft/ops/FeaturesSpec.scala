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

  test("PcmFrameEnergy: hand-computed energy envelope; duration-independent length; fail-closed") {
    // 8 samples at winSamples=4 -> window ssq (4, 48); nWins=2,
    // nFrames=2 -> envelope [4/52, 48/52]
    val a = Media.encodeWavPcm16(Seq(1, 1, 1, 1, 2, 2, 2, -6))
    // 16 samples -> 4 windows of ssq 14 each; frame 0 = w0+w1,
    // frame 1 = w2+w3 -> [0.5, 0.5]
    val b = Media.encodeWavPcm16((1 to 16).map(i => i % 4))
    // all-silent clip embeds as the zero vector (no 0/0)
    val silent = Media.encodeWavPcm16(Seq.fill(8)(0))
    val corpus = Seq((1L, a), (2L, b), (3L, silent),
      (9L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "bin")
    val got = Features.PcmFrameEnergy(winSamples = 4, nFrames = 2)
      .features(corpus, "doc_id", "bin")
      .as[(Long, Seq[Double])].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L), "non-WAV blob must be dropped")
    assert(got(1L) === Seq(4.0 / 52.0, 48.0 / 52.0))
    assert(got(2L) === Seq(0.5, 0.5))
    assert(got(3L) === Seq(0.0, 0.0))
    // fixed length regardless of clip duration
    assert(got.values.forall(_.length == 2))
  }

  test("the q177 chain runs under the AUDIO provider (modality-agnostic seam)") {
    // three steady clips (identical uniform energy envelopes — the
    // envelope is loudness-normalized, so these are duplicates in
    // feature space) and one front-loaded burst clip with a distinct
    // envelope — SemDeDup over PcmFrameEnergy must drop the steady
    // duplicates and keep the distinct shape, exactly as it does over
    // image features (the provider swap is config, not surgery)
    val quiet = (0 until 3).map { i =>
      (i.toLong, Media.encodeWavPcm16((1 to 64).map(j => (i + j) % 2)))
    }
    val loud = Seq((7L, Media.encodeWavPcm16(
      (1 to 64).map(j => if (j <= 16) 1000 * (j % 8) else 0))))
    val texts = Seq((100L, "not audio".getBytes("UTF-8")))
    val corpus = (quiet ++ loud ++ texts).toDF("doc_id", "bin")
    val prep = Similarity.prepared(
      Features.PcmFrameEnergy(winSamples = 8, nFrames = 4)
        .features(corpus, "doc_id", "bin"),
      "vec_id", "embedding")
    val dedup = Similarity.semDedup(prep,
        Similarity.strideCentroids(prep, 2L), tau = 0.99)
      .as[(Long, Long, Boolean)].collect()
    assert(dedup.map(_._1).toSet === Set(0L, 1L, 2L, 7L),
      "text blob must never enter the audio embedding space")
    val dropped = dedup.filter(!_._3).map(_._1).toSet
    assert(dropped.nonEmpty && !dropped.contains(7L),
      "near-identical quiet clips dedup; the loud clip survives")
  }

  test("GifFrameDhashFold: shift-invariant bit-occupancy; fixed 64-dim; fail-closed") {
    val pal = (0 until 128).map(k =>
      ((2 * k) % 180 + 8, (k * 5 + 17) % 180 + 8, (k * 11 + 3) % 180 + 8))
    def gif(shift: Int, c: Int) = Media.encodeGifUncompressed(12, 10,
      pal.map { case (r, g, b) => (r + shift, g + shift, b + shift) },
      (0 until 3).map(f => Array.tabulate(120)(i =>
        ((i * (3 + f + c) + i * i * (1 + 2 * f + c)) % 128).toByte)))
    val corpus = Seq((1L, gif(0, 0)), (2L, gif(16, 0)), (3L, gif(0, 5)),
      (9L, "not a gif".getBytes("UTF-8"))).toDF("doc_id", "bin")
    val got = Features.GifFrameDhashFold(maxFrames = 8)
      .features(corpus, "doc_id", "bin")
      .as[(Long, Seq[Double])].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L), "non-GIF blob must be dropped")
    assert(got.values.forall(_.length == 64), "fixed 64-dim signature")
    assert(got.values.forall(_.forall(v => v >= 0.0 && v <= 1.0)))
    // dHash is gradient-based: a uniform brightness shift preserves
    // every bit, so the folded signature is identical
    assert(got(1L) === got(2L), "brightness shift must not move the signature")
    assert(got(1L) !== got(3L), "different content must move the signature")
  }

  test("the q177 chain runs under the VIDEO provider (provider matrix complete)") {
    val pal = (0 until 128).map(k =>
      ((2 * k) % 180 + 8, (k * 5 + 17) % 180 + 8, (k * 11 + 3) % 180 + 8))
    def gif(shift: Int, c: Int) = Media.encodeGifUncompressed(12, 10,
      pal.map { case (r, g, b) => (r + shift, g + shift, b + shift) },
      (0 until 3).map(f => Array.tabulate(120)(i =>
        ((i * (3 + f + c) + i * i * (1 + 2 * f + c)) % 128).toByte)))
    // three brightness-shifted copies (identical signatures) + one
    // distinct clip + a text blob that must never enter the space
    val corpus = Seq((0L, gif(0, 0)), (1L, gif(8, 0)), (2L, gif(16, 0)),
      (7L, gif(0, 5)), (100L, "not a gif".getBytes("UTF-8")))
      .toDF("doc_id", "bin")
    val prep = Similarity.prepared(
      Features.GifFrameDhashFold(maxFrames = 8)
        .features(corpus, "doc_id", "bin"),
      "vec_id", "embedding")
    val dedup = Similarity.semDedup(prep,
        Similarity.strideCentroids(prep, 2L), tau = 0.99)
      .as[(Long, Long, Boolean)].collect()
    assert(dedup.map(_._1).toSet === Set(0L, 1L, 2L, 7L),
      "text blob must never enter the video embedding space")
    val dropped = dedup.filter(!_._3).map(_._1).toSet
    assert(dropped === Set(1L, 2L),
      "shifted copies dedup to the smallest id; the distinct clip survives")
  }
}
