package graft.ops

import graft.SparkSpec

class EnsembleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketize: inclusive edge boundary, NULL scores land in bucket 0") {
    val scored = Seq((1L, Some(5L)), (2L, Some(10L)), (3L, Some(9L)),
      (4L, Some(25L)), (5L, None))
      .toDF("doc_id", "s")
    val got = Ensemble.bucketize(scored, "s", Array(10L, 20L), "b")
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("b"))))
      .toMap
    // score >= edge clears it: 10 clears edge 10 (inclusive), 9 does
    // not; 25 clears both; NULL clears none
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 2L, 5L -> 0L))
  }

  test("bucketEdges: exact rank rule on an m < k frame, order-invariant") {
    // 20 rows, scores 1..20 — with k > m the sketch holds every row,
    // so decile edge p (permille) is the sorted value at
    // max(1, ceil(p*20/1000)): p=100 -> rank 2, p=500 -> rank 10, ...
    val rows = (1L to 20L).map(i => (i, i))
    val want = (1 until 10).map(p => (p * 100 * 20 + 999) / 1000)
      .map(_.toLong.max(1L)).toArray
    for (seed <- Seq(1, 7)) {
      val shuffled = new scala.util.Random(seed).shuffle(rows)
        .toDF("doc_id", "s")
      val got = Ensemble.bucketEdges(shuffled, "doc_id", "s",
        nBuckets = 10, k = 512)
      assert(got.toSeq === want.toSeq, s"seed $seed")
    }
  }

  test("bucketEdges: empty / all-NULL scorer fails diagnosably") {
    val empty = Seq.empty[(Long, Option[Long])].toDF("doc_id", "s")
    val e = intercept[IllegalArgumentException] {
      Ensemble.bucketEdges(empty, "doc_id", "s", nBuckets = 10)
    }
    assert(e.getMessage.contains("no non-NULL"))
  }

  test("maxGate: ensemble max + threshold; single scorer degenerates") {
    val b = Seq((1L, 2L, 7L), (2L, 5L, 5L), (3L, 4L, 1L))
      .toDF("doc_id", "b1", "b2")
    val got = Ensemble.maxGate(b, Seq("b1", "b2"), minBucket = 5L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(r.fieldIndex("b_ens")),
          r.getBoolean(r.fieldIndex("kept"))))).toMap
    assert(got === Map(1L -> ((7L, true)), 2L -> ((5L, true)),
      3L -> ((4L, false))))
    val one = Ensemble.maxGate(b, Seq("b1"), minBucket = 4L)
      .collect().map(r => (r.getLong(0),
        r.getBoolean(r.fieldIndex("kept")))).toMap
    assert(one === Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("gate: refuses an input already carrying b_ens/kept (ADVICE r17)") {
    val b = Seq((1L, 2L, 7L)).toDF("doc_id", "b1", "b_ens")
    val e = intercept[IllegalArgumentException] {
      Ensemble.gate(b, Seq("b1"), minBucket = 5L)
    }
    assert(e.getMessage.contains("b_ens"))
    val k = Seq((1L, 2L, true)).toDF("doc_id", "b1", "kept")
    intercept[IllegalArgumentException] {
      Ensemble.gate(k, Seq("b1"), minBucket = 5L)
    }
  }

  test("weighted-mean combiner: (1,0) == single scorer; max dominates mean pointwise") {
    val rnd = new scala.util.Random(18)
    val b = (1L to 500L).map(i =>
        (i, rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))
      .toDF("doc_id", "b1", "b2")
    // weights (1, 0): the decision IS the first scorer's bucketing
    val w10 = Ensemble.gate(b, Seq("b1", "b2"), minBucket = 5L,
        Ensemble.WeightedMeanBucket(Seq(1L, 0L)))
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("b_ens"))))
      .toMap
    val single = Ensemble.gate(b, Seq("b1"), minBucket = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("b_ens"))))
      .toMap
    assert(w10 === single)
    // max dominates any weighted mean pointwise (mean <= max of its
    // inputs), so the weighted gate keeps a subset at equal minBucket
    val mx = Ensemble.gate(b, Seq("b1", "b2"), minBucket = 5L)
      .collect().map(r => (r.getLong(0),
        (r.getLong(r.fieldIndex("b_ens")),
          r.getBoolean(r.fieldIndex("kept"))))).toMap
    val wm = Ensemble.gate(b, Seq("b1", "b2"), minBucket = 5L,
        Ensemble.WeightedMeanBucket(Seq(2L, 1L)))
      .collect().map(r => (r.getLong(0),
        (r.getLong(r.fieldIndex("b_ens")),
          r.getBoolean(r.fieldIndex("kept"))))).toMap
    wm.foreach { case (id, (bw, kw)) =>
      assert(bw <= mx(id)._1, s"mean exceeded max for doc $id")
      assert(!kw || mx(id)._2, s"weighted kept doc $id the max dropped")
    }
    // exact-integer spot check: (2*7 + 1*2) DIV 3 = 5
    val spot = Ensemble.gate(Seq((1L, 7L, 2L)).toDF("doc_id", "b1", "b2"),
        Seq("b1", "b2"), minBucket = 5L,
        Ensemble.WeightedMeanBucket(Seq(2L, 1L)))
      .collect().head
    assert(spot.getLong(spot.fieldIndex("b_ens")) === 5L)
    assert(spot.getBoolean(spot.fieldIndex("kept")))
  }

  test("weighted-mean combiner: malformed weights fail diagnosably") {
    val b = Seq((1L, 2L, 7L)).toDF("doc_id", "b1", "b2")
    intercept[IllegalArgumentException] { // arity mismatch
      Ensemble.gate(b, Seq("b1", "b2"), 5L,
        Ensemble.WeightedMeanBucket(Seq(1L)))
    }
    intercept[IllegalArgumentException] { // all-zero weights
      Ensemble.gate(b, Seq("b1", "b2"), 5L,
        Ensemble.WeightedMeanBucket(Seq(0L, 0L)))
    }
    intercept[IllegalArgumentException] { // negative weight
      Ensemble.gate(b, Seq("b1", "b2"), 5L,
        Ensemble.WeightedMeanBucket(Seq(2L, -1L)))
    }
  }

  test("merged per-segment partials derive the ONE-SHOT edges exactly (property)") {
    // the maintained face's law at the Ensemble level: bottom-k merge
    // over disjoint segments == one-shot sketch, so the edges are
    // bit-identical for ANY segmentation
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(61)
    val scored = (1L to 3000L).map(i =>
      (i, rnd.nextInt(1000000).toLong)).toDF("doc_id", "s")
    val oneShot = Ensemble.bucketEdges(scored, "doc_id", "s", 10)
    for (nSeg <- Seq(2, 5)) {
      val partials = (0 until nSeg).map(i =>
          Sketches.quantilePartials(
            scored.filter(pmod($"doc_id", lit(nSeg)) === i),
            Nil, $"doc_id", $"s", 512))
        .reduce(_ unionByName _)
      // the RAW per-segment union goes in — the bottom-k merge is
      // bucketEdgesFromPartials' own job (closing review: estimating
      // over an unmerged union would silently diverge)
      val merged = Ensemble.bucketEdgesFromPartials(partials, 10)
      assert(merged.toSeq === oneShot.toSeq, s"diverged at $nSeg segments")
    }
  }

  test("bucket distribution is equi-depth-ish on a uniform scorer (sketch-bounded)") {
    // 5000 distinct scores, k = 512: every decile bucket must land
    // within the DKW-ish rank error of 500 rows — a sanity check
    // that the edges actually cut the distribution, not a tight bound
    val scored = (1L to 5000L).map(i => (i, i * 13L % 5000L))
      .toDF("doc_id", "s")
    val edges = Ensemble.bucketEdges(scored, "doc_id", "s", nBuckets = 10)
    val counts = Ensemble.bucketize(scored, "s", edges, "b")
      .groupBy($"b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0L to 9L).toSet)
    assert(counts.values.forall(c => c > 200L && c < 900L),
      s"bucket far from equi-depth: $counts")
  }
}
