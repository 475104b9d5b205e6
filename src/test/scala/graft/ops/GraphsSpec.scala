package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int,
                    parts: Int = 1): Map[Long, Long] =
    Graphs.pageRank(
        edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("symmetric pair is a fixed point; star center dominates; deterministic") {
    // a <-> b: every node keeps exactly scale (0.15S + 0.85*S = S)
    val pair = ranks(Seq((1L, 2L), (2L, 1L)), iters = 4)
    assert(pair === Map(1L -> 1000000000000L, 2L -> 1000000000000L))
    // star: leaves give everything to the center, the center splits
    // across 4 leaves — the center must rank strictly highest
    val starEdges = (2L to 5L).flatMap(l => Seq((1L, l), (l, 1L)))
    val star = ranks(starEdges, iters = 5)
    assert((2L to 5L).forall(l => star(1L) > star(l)))
    assert(star.values.toSet.size === 2, "leaves must tie exactly")
    // bit-identical on a different partitioning
    assert(ranks(starEdges, iters = 5, parts = 7) === star)
  }

  test("pageRank: sink nodes (out-degree 0) are rejected up front") {
    // 3 appears as dst only — its received mass would silently vanish
    val ex = intercept[IllegalArgumentException] {
      ranks(Seq((1L, 2L), (2L, 1L), (2L, 3L)), iters = 2)
    }
    assert(ex.getMessage.contains("sink"))
  }

  test("pageRank: skipSinkCheck skips the guard job, same result on a sink-free graph") {
    val starEdges = (2L to 5L).flatMap(l => Seq((1L, l), (l, 1L)))
    val checked = ranks(starEdges, iters = 5)
    val skipped = Graphs.pageRank(starEdges.toDF("src", "dst"), iters = 5,
        skipSinkCheck = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(skipped === checked)
    // and the contract really is the caller's problem when skipped:
    // a sink graph no longer throws (its mass silently drains — the
    // documented trade the flag makes explicit)
    Graphs.pageRank(Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst"),
      iters = 1, skipSinkCheck = true).collect()
  }

  test("pageRank: in-degree-0 source holds base rank and keeps contributing") {
    // 3 -> 2 with nothing pointing at 3: node 3 must stay in the
    // result at the base rank and feed 2 every round (pre-r11 it
    // dropped out of the rank table after round 1). Hand-unrolled
    // recurrence, S = 10^12, base = 0.15S:
    //   round 1: r2 = base + 0.85*(S + S) = 1.85S; r1 = S; r3 = base
    //   round 2: r2 = base + 0.85*(S + 0.15S) = 1.1275S
    //            r1 = base + 0.85*1.85S = 1.7225S; r3 = base
    val got = ranks(Seq((1L, 2L), (2L, 1L), (3L, 2L)), iters = 2)
    assert(got === Map(
      1L -> 1722500000000L, 2L -> 1127500000000L, 3L -> 150000000000L))
    assert(ranks(Seq((1L, 2L), (2L, 1L), (3L, 2L)), iters = 2, parts = 5)
      === got)
  }

  test("coOccurrenceEdges: distinct items per key, ordered pairs, multiplicity across keys") {
    val df = Seq((10L, "a"), (10L, "a"), (10L, "b"), (10L, "c"),
      (20L, "a"), (20L, "b")).toDF("k", "item")
    val e = Graphs.coOccurrenceEdges(df, "k", "item")
      .groupBy($"src", $"dst").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // (a,b) co-occur under both keys -> multiplicity 2; duplicate
    // (10,a) rows collapse first
    assert(e(("a", "b")) === 2L && e(("b", "a")) === 2L)
    assert(e(("a", "c")) === 1L && e(("b", "c")) === 1L)
    assert(!e.contains(("a", "a")))
  }

  private def triCounts(edges: Seq[(Long, Long)],
                        parts: Int = 1): Map[Long, Long] =
    Graphs.triangleCounts(edges.toDF("src", "dst").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangleCounts: known small graphs, exactly once per triangle") {
    // triangle + pendant edge: 1-2-3 closed, 4 hangs off 1
    val tri = triCounts(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)))
    assert(tri === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // K4: every node in C(3,2) = 3 triangles; duplicate/reversed
    // edges collapse first
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)
    assert(triCounts(k4) === (1L to 4L).map(_ -> 3L).toMap)
    // square (no diagonal): zero triangles -> empty result
    assert(triCounts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
  }

  test("triangleCounts: equals the definitional count, any partitioning") {
    // random graph, compare against an O(n^3) driver-side reference
    val rnd = new scala.util.Random(31)
    val n = 24
    val edges = (for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
    } yield (a, b)).toSeq
    val eset = edges.toSet
    def adj(x: Long, y: Long) = eset((math.min(x, y), math.max(x, y)))
    val want = (0L until n).map { v =>
      v -> (for {
        x <- 0L until n; y <- (x + 1) until n
        if x != v && y != v && adj(v, x) && adj(v, y) && adj(x, y)
      } yield 1).size.toLong
    }.filter(_._2 > 0).toMap
    assert(triCounts(edges) === want)
    assert(triCounts(edges, parts = 7) === want)
  }

  test("bfsHops: exact hop fronts, early stop, off-graph seeds kept at 0") {
    import spark.implicits._
    // path 1-2-3-4-5 + isolated seed 9
    val edges = (1L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(1L, 9L).toDF("node")
    val got = Graphs.bfsHops(edges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 5 is 4 hops away -> absent at maxHops=3
    assert(got === Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // maxHops beyond exhaustion changes nothing (early stop = no-op
    // rounds)
    val far = Graphs.bfsHops(edges, seeds, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(far === got + (5L -> 4L))
    // undirected: reaching BACKWARD works too
    val back = Graphs.bfsHops(edges, Seq(5L).toDF("node"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back === Map(5L -> 0L, 4L -> 1L, 3L -> 2L))
  }

  test("kCore: cascade peel reaches the maximal core; non-convergence throws") {
    import spark.implicits._
    // K4 core {1,2,3,4} + a chain 4-5-6 that peels in CASCADE for
    // k=2: 6 falls (deg 1), then 5 (its degree drops to 1), while the
    // K4 survives with in-core degree 3
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val got = Graphs.kCore(edges, k = 2L, maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 4L).map(_ -> 3L).toMap)
    // k above the max degree peels everything: empty fixpoint, no throw
    assert(Graphs.kCore(edges, k = 10L, maxRounds = 8).count() === 0L)
    // a chain needs one round per node: maxRounds=1 must throw, not
    // silently return the unconverged set
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graphs.kCore(chain, k = 2L, maxRounds = 1)
    }
    assert(ex.getMessage.contains("fixpoint"))
  }

  test("clusteringCoefficients: exact ppm, zero for triangle-free, degree-1 excluded") {
    import spark.implicits._
    // triangle 1-2-3 + pendant 4 on 1 + isolated edge 5-6
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (5L, 6L))
    val got = Graphs.clusteringCoefficients(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // node 1: d=3, T=1 -> 2*1e6/6 = 333333; nodes 2,3: d=2, T=1 ->
    // 1000000; node 4,5,6: d=1 -> excluded
    assert(got === Map(
      1L -> (3L, 1L, 333333L),
      2L -> (2L, 1L, 1000000L),
      3L -> (2L, 1L, 1000000L)))
    // triangle-free node of degree 2 reports 0
    val path = Graphs.clusteringCoefficients(
        Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(path === Map(2L -> 0L))
  }

  test("labelPropagation: hand-unrolled rounds separate two bridged triangles") {
    // triangles {1,2,3} and {4,5,6}, bridge 3-4; symmetric edges.
    // Hand trace (count desc, label asc ties), seeds = own id:
    //  round 1: 1->2, 2->1, 3->1, 4->3, 5->4, 6->4
    //  round 2: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
    //  round 3: 1->1, 2->1, 3->1, 4->3, 5->3, 6->3
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    def labels(r: Int) = Graphs.labelPropagation(edges, rounds = r)
      .as[(Long, Long)].collect().toMap
    assert(labels(1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      5L -> 4L, 6L -> 4L))
    assert(labels(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 3L, 6L -> 3L))
    assert(labels(3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      5L -> 3L, 6L -> 3L))
  }

  test("hits: hand-unrolled integer recurrence on a bipartite buyer/seller graph") {
    // c1->{s1,s2}, c2->s1; S = 10^12. Hand trace:
    //  r1: auth_raw s1=2S s2=S, max 2S  -> auth s1=S s2=S/2
    //      hub_raw  c1=1.5S c2=S        -> hub  c1=S c2=floor(S^2/1.5S)
    //  r2: auth_raw s1=S+666666666666 s2=S -> auth s1=S s2=600000000000
    //      hub_raw  c1=1.6e12 c2=S         -> hub  c1=S c2=625000000000
    val edges = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"))
      .toDF("src", "dst")
    def run(iters: Int, parts: Int = 1) =
      Graphs.hits(edges.repartition(parts), iters)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val S = 1000000000000L
    val r1 = run(1)
    assert(r1 === Map(
      "c1" -> ((S, 0L)), "c2" -> ((666666666666L, 0L)),
      "s1" -> ((0L, S)), "s2" -> ((0L, 500000000000L))))
    val r2 = run(2)
    assert(r2 === Map(
      "c1" -> ((S, 0L)), "c2" -> ((625000000000L, 0L)),
      "s1" -> ((0L, S)), "s2" -> ((0L, 600000000000L))))
    // bit-identical on a different partitioning
    assert(run(2, parts = 7) === r2)
    // single edge: both endpoints anchor their role at S
    val one = Graphs.hits(Seq(("a", "b")).toDF("src", "dst"), iters = 3)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(one === Map("a" -> ((S, 0L)), "b" -> ((0L, S))))
    // multi-edges weight the sums: c2's double edge to s1 beats c1
    val multi = Seq(("c1", "s1"), ("c2", "s1"), ("c2", "s1"),
      ("c1", "s2")).toDF("src", "dst")
    val m = Graphs.hits(multi, iters = 2)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("c2")._1 > m("c1")._1)
  }

  test("personalizedPageRank: hand-unrolled seed-teleport recurrence") {
    // path 1-2-3 (symmetric), seed {1}; S = 10^12, base = 1.5e11.
    // deg: 1->1, 2->2, 3->1. r0 = (S, 0, 0).
    //  r1: 1 = 0+base; 2 = 85*S/100; 3 = 0
    //  r2: 1 = 85*(r1(2)/2)/100 + base = 361250000000 + 150000000000
    //      2 = 85*(r1(1)/1)/100 = 127500000000
    //      3 = 85*(r1(2)/2)/100 = 361250000000
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    // 99 is off-graph: ignored (the node table drives)
    val seeds = Seq(1L, 99L).toDF("node")
    def run(iters: Int, parts: Int = 1) =
      Graphs.personalizedPageRank(edges.repartition(parts), seeds, iters)
        .as[(Long, Long)].collect().toMap
    assert(run(1) === Map(1L -> 150000000000L, 2L -> 850000000000L,
      3L -> 0L))
    val r2 = run(2)
    assert(r2 === Map(1L -> 511250000000L, 2L -> 127500000000L,
      3L -> 361250000000L))
    assert(run(2, parts = 5) === r2)
    // seeds pull rank toward themselves: the seed outranks the far end
    assert(r2(1L) > r2(3L))
    // sink guard carries over from pageRank
    val ex = intercept[IllegalArgumentException] {
      Graphs.personalizedPageRank(
        Seq((1L, 2L)).toDF("src", "dst"), Seq(1L).toDF("node"), 2)
    }
    assert(ex.getMessage.contains("sink"))
  }

  test("cheapestPaths: min-plus relaxation per hop bound, early stop, guards") {
    // 1->2 (5), 2->3 (1), 1->3 (10), 3->4 (2): node 3 improves from
    // 10 to 6 in round 2, which must re-relax 4 from 12 to 8 in
    // round 3 — the frontier-re-entry case
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L),
      (3L, 4L, 2L)).toDF("src", "dst", "w")
    val seeds = Seq(1L, 99L).toDF("node") // 99 is off-graph: kept at 0
    def run(h: Int, parts: Int = 1) =
      Graphs.cheapestPaths(edges.repartition(parts), seeds, h)
        .as[(Long, Long)].collect().toMap
    assert(run(0) === Map(1L -> 0L, 99L -> 0L))
    assert(run(1) === Map(1L -> 0L, 99L -> 0L, 2L -> 5L, 3L -> 10L))
    assert(run(2) === Map(1L -> 0L, 99L -> 0L, 2L -> 5L, 3L -> 6L,
      4L -> 12L))
    assert(run(3) === Map(1L -> 0L, 99L -> 0L, 2L -> 5L, 3L -> 6L,
      4L -> 8L))
    // early stop: extra rounds are no-ops, same result
    assert(run(32) === run(3))
    assert(run(3, parts = 7) === run(3))
    // negative weights rejected in-plan
    val ex = intercept[Exception] {
      Graphs.cheapestPaths(
        Seq((1L, 2L, -1L)).toDF("src", "dst", "w"),
        Seq(1L).toDF("node"), 2).collect()
    }
    assert(ex.getMessage.contains("negative weight"))
  }

  test("labelPropagation: multi-edges weight the vote") {
    // 7 has two edges to 8 and one to 9: label 8 outvotes the
    // smaller label 9 (2 > 1), so multiplicity — not the tie order —
    // must decide
    val e = Seq((7L, 8L), (7L, 8L), (7L, 9L), (8L, 7L), (9L, 7L))
      .toDF("src", "dst")
    val got = Graphs.labelPropagation(e, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(got(7L) == 8L)
  }

  test("labelPropagation: dst-only nodes are present, votable, and keep their label") {
    import spark.implicits._
    // 1->2, 3->2: node 2 never appears as src (ADVICE r12 — it was
    // silently absent AND the edges pointing at it cast no votes).
    // Round 1: 1 and 3 adopt 2's self-label; 2 has no out-neighbors
    // so it keeps its own label every round.
    val e = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    for (r <- Seq(1, 3)) {
      val got = Graphs.labelPropagation(e, rounds = r)
        .as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
        s"after $r round(s)")
    }
  }
}
