package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ran"),
    (3L, "a dog sat"),
    (4L, "the cat sat again")).toDF("doc_id", "text")

  test("bigramModel: exact counts with the denominator denormalized in") {
    val m = LangModel.bigramModel(ref, "text")
      .as[(String, String, Long, Long)].collect().toSet
    // "the cat" appears 3x; w1="the" count = 4 ("the" twice in doc 1)
    assert(m.contains(("the", "cat", 3L, 4L)))
    assert(m.contains(("cat", "sat", 2L, 3L)))
    assert(m.contains(("the", "mat", 1L, 4L)))
    // every cnt_ab <= its cnt_a (a conditional count can't exceed the
    // conditioning count)
    assert(m.forall { case (_, _, ab, a) => ab <= a })
  }

  test("scoreDocs: bigram hit, unigram backoff, and OOV score exactly") {
    val uni = LangModel.unigramCounts(ref, "text")
    val model = LangModel.bigramModel(ref, "text")
    // n_tok = 16 reference tokens
    assert(uni.agg(sum($"cnt")).as[Long].head() === 16L)
    val docs = Seq(
      (10L, "the cat"),     // bigram hit: 3*1e6 DIV 4 = 750000
      (11L, "sat cat"),     // no bigram "sat cat"; backoff on "cat":
                            // 400000*3 DIV 16 = 75000
      (12L, "zz yy"),       // all OOV: fluency 0, oov 1e6
      (13L, "the"),         // single token: no transitions
      (14L, "")             // empty: 0 tokens
    ).toDF("doc_id", "text")
    val got = LangModel.scoreDocs(docs, "doc_id", "text", model, uni)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(10L) === ((10L, 2L, 1L, 0L, 750000L)))
    assert(got(11L) === ((11L, 2L, 1L, 0L, 75000L)))
    assert(got(12L) === ((12L, 2L, 1L, 1000000L, 0L)))
    assert(got(13L) === ((13L, 1L, 0L, 0L, 0L)))
    assert(got(14L) === ((14L, 0L, 0L, 0L, 0L)))
  }

  test("scoreDocs: fluency is the mean of mixed transition scores") {
    val uni = LangModel.unigramCounts(ref, "text")
    val model = LangModel.bigramModel(ref, "text")
    // "the cat zz": transition 1 = 750000 (bigram), transition 2 = 0
    // (OOV continuation) -> mean 375000; oov = 1 of 3 tokens
    val got = LangModel.scoreDocs(
        Seq((1L, "the cat zz")).toDF("doc_id", "text"),
        "doc_id", "text", model, uni)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((1L, 3L, 2L, 333333L, 375000L)))
  }

  test("filterFluent keeps on both boundaries inclusively") {
    val scored = Seq(
      (1L, 5L, 4L, 200000L, 33000L),  // both at the boundary: kept
      (2L, 5L, 4L, 200001L, 33000L),  // oov over: dropped
      (3L, 5L, 4L, 0L, 32999L)        // fluency under: dropped
    ).toDF("doc_id", "n_tokens", "n_trans", "oov_ppm", "fluency_ppm")
    val kept = LangModel.filterFluent(scored, 33000L, 200000L)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(1L))
  }

  test("merge law: partials under ANY segmentation serve the exact model") {
    val segged = ref.withColumn("seg", pmod($"doc_id", lit(2)))
    val uni = LangModel.mergeUnigrams(
      LangModel.unigramPartials(segged, "seg", "text"))
    val model = LangModel.mergeBigramModel(
      LangModel.bigramPartials(segged, "seg", "text"), uni)
    val oneShotUni = LangModel.unigramCounts(ref, "text")
      .as[(String, Long)].collect().toSet
    val oneShotModel = LangModel.bigramModel(ref, "text")
      .as[(String, String, Long, Long)].collect().toSet
    assert(uni.as[(String, Long)].collect().toSet === oneShotUni)
    assert(model.as[(String, String, Long, Long)].collect().toSet
      === oneShotModel)
    // and the downstream decision is segmentation-invariant
    val docs = Seq((10L, "the cat"), (11L, "zz yy")).toDF("doc_id", "text")
    val a = LangModel.scoreDocs(docs, "doc_id", "text",
        LangModel.bigramModel(ref, "text"),
        LangModel.unigramCounts(ref, "text"))
      .collect().map(_.toSeq).toSet
    val b = LangModel.scoreDocs(docs, "doc_id", "text", model, uni)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("scoreDocsTrigram: hit, bigram backoff, unigram backoff, OOV — exact at every level") {
    val uni = LangModel.unigramCounts(ref, "text")
    val bi = LangModel.bigramModel(ref, "text")
    val tri = LangModel.trigramModel(ref, "text")
    // "the cat sat" occurs in docs 1 and 4; context "the cat" count 3
    assert(tri.filter($"w1" === "the" && $"w2" === "cat" && $"w3" === "sat")
      .select($"cnt_abc", $"cnt_ab").as[(Long, Long)].head() === ((2L, 3L)))
    val docs = Seq(
      (10L, "the cat sat"), // trigram hit: 2*1e6 DIV 3 = 666666
      (11L, "ran the cat"), // bigram backoff (the,cat): 400000*3 DIV 4
      (12L, "zz yy sat"),   // unigram backoff sat(3): 160000*3 DIV 16
      (13L, "zz yy qq"),    // OOV continuation: 0
      (14L, "the cat")      // < 3 tokens: no trigram transitions
    ).toDF("doc_id", "text")
    val got = LangModel.scoreDocsTrigram(docs, "doc_id", "text",
        tri, bi, uni)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(got(10L) === ((10L, 3L, 1L, 0L, 666666L)))
    assert(got(11L)._5 === 300000L)
    assert(got(12L)._5 === 30000L)
    assert(got(13L)._5 === 0L)
    assert(got(13L)._4 === 1000000L)
    assert(got(14L) === ((14L, 2L, 0L, 0L, 0L)))
  }

  test("trigram merge law: partials under ANY segmentation serve the exact model") {
    val segged = ref.withColumn("seg", pmod(length($"text"), lit(3)))
    // build per-segment partials through the public trainers and
    // merge — must equal the one-shot model
    val parts = (0 to 2).map(i =>
      LangModel.trigramCounts(segged.filter($"seg" === i), "text"))
      .reduce(_ unionByName _)
    val biC = LangModel.mergeBigramCounts(
      (0 to 2).map(i =>
        LangModel.bigramCounts(segged.filter($"seg" === i), "text"))
        .reduce(_ unionByName _))
    val merged = LangModel.mergeTrigramModel(parts, biC)
      .as[(String, String, String, Long, Long)].collect().toSet
    val oneShot = LangModel.trigramModel(ref, "text")
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(merged === oneShot)
  }

  test("scoreDocsTrigram rejects an alphaPpm whose square is not a whole ppm") {
    val uni = LangModel.unigramCounts(ref, "text")
    intercept[IllegalArgumentException] {
      LangModel.scoreDocsTrigram(ref, "doc_id", "text",
        LangModel.trigramModel(ref, "text"),
        LangModel.bigramModel(ref, "text"), uni, alphaPpm = 333333L)
    }
  }

  test("scoreDocs fails closed past the ppm exactness bound") {
    // a model count whose ppm-scaled numerator exceeds 2^53 must raise
    // in-plan at the point of division (ADVICE r16), never silently
    // round: plant cnt_ab past the ~9.0e9 bound on a bigram the doc
    // actually scores
    val uni = Seq(("the", 10000000000L), ("cat", 3L))
      .toDF("tok", "cnt")
    val model = Seq(("the", "cat", 10000000000L, 10000000000L))
      .toDF("w1", "w2", "cnt_ab", "cnt_a")
    val docs = Seq((1L, "the cat")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      LangModel.scoreDocs(docs, "doc_id", "text", model, uni).collect()
    }
    assert(e.getMessage.contains("exceeds the exactness bound") ||
      Option(e.getCause).exists(
        _.getMessage.contains("exceeds the exactness bound")))
  }

  test("scoreDocs is partitioning-invariant") {
    val uni = LangModel.unigramCounts(ref, "text")
    val model = LangModel.bigramModel(ref, "text")
    val docs = Seq((10L, "the cat sat"), (11L, "a dog ran zz"),
      (12L, "mat mat mat")).toDF("doc_id", "text")
    val a = LangModel.scoreDocs(docs, "doc_id", "text", model, uni)
      .collect().map(_.toSeq).toSet
    val b = LangModel.scoreDocs(docs.repartition(7), "doc_id", "text",
        model.repartition(3), uni.repartition(5))
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
