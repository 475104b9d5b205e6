package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val labeled = Seq(
    ("spam", "buy now buy cheap"),
    ("spam", "click free buy"),
    ("ham", "meeting notes for today"),
    ("ham", "notes on the meeting agenda")).toDF("label", "text")

  test("classTokenCounts / tokenWeights / baseRates: exact smoothed ppb") {
    val counts = Classify.classTokenCounts(labeled, "label", "text")
      .as[(String, String, Long)].collect().toSet
    assert(counts.contains(("spam", "buy", 3L)))
    assert(counts.contains(("ham", "notes", 2L)))
    // n_spam = 7, n_ham = 9, V = 12 distinct training tokens
    val v = 12L
    val rates = Classify.baseRates(counts.toSeq.toDF("label", "tok", "cnt"))
      .as[(String, Long)].collect().toMap
    assert(rates("spam") === 1000000000L / (7L + v))
    assert(rates("ham") === 1000000000L / (9L + v))
    val w = Classify.tokenWeights(counts.toSeq.toDF("label", "tok", "cnt"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(w(("spam", "buy")) ===
      (3L + 1L) * 1000000000L / (7L + v) - 1000000000L / (7L + v))
    // every delta is positive (cnt >= 1 in a count row)
    assert(w.values.forall(_ > 0L))
  }

  test("predict: argmax, absent-token base-rate fold, and tie-break") {
    val counts = Classify.classTokenCounts(labeled, "label", "text")
    val w = Classify.tokenWeights(counts)
    val r = Classify.baseRates(counts)
    val docs = Seq(
      (1L, "buy free stuff"),        // spam markers dominate
      (2L, "agenda for the meeting"), // ham vocabulary
      (3L, "zz yy xx"),              // all OOV: ties at n*rate0 ->
                                     // higher rate0 wins (spam: smaller
                                     // denominator 7+12 < 9+12)
      (4L, "")                       // no tokens: 0 for both -> label
                                     // asc = ham
    ).toDF("doc_id", "text")
    val got = Classify.predict(docs, "doc_id", "text", w, r)
      .as[(Long, String, Long)].collect().map(x => x._1 -> x).toMap
    assert(got(1L)._2 === "spam")
    assert(got(2L)._2 === "ham")
    assert(got(3L)._2 === "spam")
    assert(got(3L)._3 === 3L * (1000000000L / 19L))
    assert(got(4L)._2 === "ham")
    assert(got(4L)._3 === 0L)
  }

  test("merge law: partials under ANY segmentation train the exact model") {
    val segged = labeled.withColumn("seg",
      pmod(length($"text"), lit(2)))
    val merged = Classify.mergeClassTokenCounts(
      Classify.classTokenPartials(segged, "seg", "label", "text"))
    val oneShot = Classify.classTokenCounts(labeled, "label", "text")
    assert(merged.as[(String, String, Long)].collect().toSet ===
      oneShot.as[(String, String, Long)].collect().toSet)
    // downstream predictions are segmentation-invariant
    val docs = Seq((1L, "buy the agenda"), (2L, "free notes"))
      .toDF("doc_id", "text")
    def pred(c: org.apache.spark.sql.DataFrame) =
      Classify.predict(docs, "doc_id", "text",
        Classify.tokenWeights(c), Classify.baseRates(c))
        .collect().map(_.toSeq).toSet
    assert(pred(merged) === pred(oneShot))
  }

  test("marginScores equals the scoreAll difference; missing labels rejected") {
    val counts = Classify.classTokenCounts(labeled, "label", "text")
    val w = Classify.tokenWeights(counts)
    val r = Classify.baseRates(counts)
    val docs = Seq((1L, "buy free stuff"), (2L, "meeting agenda"),
      (3L, ""), (4L, "zz yy")).toDF("doc_id", "text")
    val scores = Classify.scoreAll(docs, "doc_id", "text", w, r)
      .as[(Long, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val got = Classify.marginScores(docs, "doc_id", "text", w, r,
        "spam", "ham")
      .as[(Long, Long)].collect().toMap
    for (id <- Seq(1L, 2L, 3L, 4L))
      assert(got(id) === scores((id, "spam")) - scores((id, "ham")))
    intercept[IllegalArgumentException] {
      Classify.marginScores(docs, "doc_id", "text", w, r,
        "spam", "nosuch").collect()
    }
  }

  test("calibrateThreshold picks the ARGMIN threshold meeting the precision bound") {
    // margins with interleaved positives/negatives so precision is
    // non-monotonic in the threshold
    val held = Seq(
      (100L, true), (90L, true), (80L, false), (70L, true),
      (60L, true), (50L, true), (40L, false), (30L, false),
      (20L, true), (10L, false)).toDF("margin_ppb", "is_pos")
    for (target <- Seq(1000000L, 800000L, 700000L, 600000L, 0L)) {
      val got = Classify.calibrateThreshold(held, "margin_ppb",
        "is_pos", target)
      // brute force over every candidate threshold
      val rows = Seq(
        (100L, true), (90L, true), (80L, false), (70L, true),
        (60L, true), (50L, true), (40L, false), (30L, false),
        (20L, true), (10L, false))
      val want = rows.map(_._1).distinct.filter { t =>
        val kept = rows.filter(_._1 >= t)
        kept.count(_._2).toLong * 1000000L >= target * kept.size.toLong
      }.min
      assert(got === want, s"target $target")
    }
    // an unachievable bound (all-negative slice, target 100%) throws
    intercept[IllegalArgumentException] {
      Classify.calibrateThreshold(
        Seq((5L, false)).toDF("margin_ppb", "is_pos"),
        "margin_ppb", "is_pos", 1000000L)
    }
  }

  test("predict is partitioning-invariant") {
    val counts = Classify.classTokenCounts(labeled, "label", "text")
    val docs = Seq((1L, "buy meeting"), (2L, "click click notes"),
      (3L, "today free")).toDF("doc_id", "text")
    val a = Classify.predict(docs, "doc_id", "text",
      Classify.tokenWeights(counts), Classify.baseRates(counts))
      .collect().map(_.toSeq).toSet
    val b = Classify.predict(docs.repartition(5), "doc_id", "text",
      Classify.tokenWeights(counts.repartition(3)),
      Classify.baseRates(counts))
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
