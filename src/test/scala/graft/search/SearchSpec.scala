package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.recipes.Recipes

/** Search semantics tests (SURVEY.md §5.3): ES AUTO fuzziness rule,
  * clause composition, and the two UI-default queries pinned against
  * the fixture (hit counts and ranking invariants, not ES scores —
  * engine scoring is deterministic and its own spec).
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  lazy val view =
    Recipes.searchView(Recipes.dedupByKey(Recipes.loadRaw(spark))).cache()

  test("ES AUTO fuzziness thresholds (Q1)") {
    val got = Seq("ab", "abc", "abcde", "abcdef")
      .toDF("t").select(Search.autoFuzz($"t")).as[Int].collect().toSeq
    assert(got === Seq(0, 1, 1, 2))
  }

  test("fuzzy token matching: singular/plural and accent distance (Q2)") {
    val docs = Seq(Seq("oeufs", "chocolats", "farine")).toDF("toks")
    assert(docs.select(Search.fuzzyHit($"toks", "oeuf")).head.getBoolean(0))
    assert(docs.select(Search.fuzzyHit($"toks", "chocolat")).head.getBoolean(0))
    assert(!docs.select(Search.fuzzyHit($"toks", "xy")).head.getBoolean(0))
  }

  test("analyzer keeps accents, splits on non-letter/digit (Q6)") {
    val got = Seq("Crème BRÛLÉE, 3 oeufs!").toDF("t")
      .select(Search.analyze($"t")).as[Seq[String]].head()
    assert(got === Seq("crème", "brûlée", "3", "oeufs"))
    assert(Search.analyzeLiteral("Crème BRÛLÉE, 3 oeufs!") ===
      Seq("crème", "brûlée", "3", "oeufs"))
  }

  test("classic('chocolat') pinned hit-set size and score range (Q1/T1)") {
    val rows = Search.classic(view, "chocolat").collect()
    assert(rows.length === 214)
    val scores = rows.map(_.getAs[Long]("score"))
    assert(scores.max === 3L)
    assert(scores.min >= 1L)
  }

  test("classic results are ranked score-desc with id tie-break (T1)") {
    val rows = Search.classic(view, "chocolat")
      .select($"score", $"product_id").as[(Long, String)].collect()
    assert(rows.sliding(2).forall {
      case Array((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2)
      case _ => true
    })
  }

  test("frigo('oeufs, farine, lait') caps at 500 and ranks by matched count (Q5)") {
    val rows = Search.frigo(view, "oeufs, farine, lait").collect()
    assert(rows.length === 500)
    val scores = rows.map(_.getAs[Long]("score"))
    assert(scores.max === 3L)
    assert(scores.min >= 1L)
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("frigo clause: wildcard catches glued tokens (Q3/Q4)") {
    val d = Seq(("1oeuf et sel", Seq("1oeuf", "et", "sel")))
      .toDF("raw", "toks")
    assert(d.select(Search.clauseMatch($"toks", $"raw", "oeuf"))
      .head.getBoolean(0))
  }

  test("frigo splitClauses trims, lowercases, drops empties (F13)") {
    assert(Search.splitClauses(" Oeufs , FARINE ,, lait ") ===
      Seq("oeufs", "farine", "lait"))
  }

  test("bm25Search: tf saturation and length normalization (ranking invariants)") {
    val docs = Seq(
      (1L, "spark alpha beta gamma"),          // tf=1, dl=4
      (2L, "spark spark alpha beta"),          // tf=2, same dl
      (3L, "spark alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (4L, "nothing relevant here at all")
    ).toDF("doc_id", "text")
    val got = Search.bm25Search(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("score_fp"))
      .toMap
    assert(!got.contains(4L)) // no hit, no row
    // saturation (k1): doubling tf raises but must NOT double the score
    assert(got(2L) > got(1L))
    assert(got(2L) < 2L * got(1L))
    // length normalization (b): same tf, longer doc scores lower —
    // the exact case raw IDF (idfSearch) scores EQUAL
    assert(got(3L) < got(1L))
    val idf = Search.idfSearch(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("score_fp"))
      .toMap
    assert(idf(3L) === idf(1L))
  }

  test("bm25ClassicScores: exact match outranks a distance-2 match of equal df/tf/dl") {
    val docs = Seq(
      (1L, "chocolat aaa bbb"),   // exact term,      boost 1
      (2L, "chocolaxx aaa bbb")   // distance-2 term, boost (8-2)/8
    ).toDF("doc_id", "text")
    val got = Search.bm25ClassicScores(docs, "doc_id", Seq("text"), "chocolat")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("score_fp"))
      .toMap
    // both docs hit (fuzzy expansion reaches chocolaxx), same df/tf/dl —
    // only the fuzzy boost separates them
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) > got(2L))
  }

  test("bm25Classic('chocolat') hits exactly the fuzzy hit-set, ranked by BM25") {
    val rows = Search.bm25Classic(view, "chocolat")
      .select($"product_id", $"score_fp").as[(String, Long)].collect()
    // same fuzzy expansion as classic() => same hit-set cardinality (q45)
    assert(rows.length === 214)
    val classicIds = Search.classic(view, "chocolat")
      .select($"product_id").as[String].collect().toSet
    assert(rows.map(_._1).toSet === classicIds)
    // ranked score-desc with id tie-break, scores all positive
    assert(rows.forall(_._2 > 0))
    assert(rows.sliding(2).forall {
      case Array((i1, s1), (i2, s2)) => s1 > s2 || (s1 == s2 && i1 < i2)
      case _ => true
    })
  }

  test("bm25 from the persisted index equals the inline forms (exact + fuzzy)") {
    Search.writeBm25Index(view, "product_id",
      Seq("name", "ingredients_text", "steps_text"),
      "bm25_spec_post", "bm25_spec_df", "bm25_spec_stats", numBuckets = 4)
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select($"id", $"score_fp").as[(String, Long)].collect()
          .sortBy(identity)
      val fields = Seq("name", "ingredients_text", "steps_text")
      // exact-token multi-field form
      val toks = Search.analyzeLiteral("tarte chocolat")
      val inline = rows(Search.bm25MultiField(view, "product_id",
        fields, toks))
      val served = rows(Search.bm25MultiFieldFromIndex(spark,
        "bm25_spec_post", "bm25_spec_df", "bm25_spec_stats", fields, toks))
      assert(served.nonEmpty)
      assert(served.toSeq === inline.toSeq)
      // fuzzy-expanded classic form: the AUTO expansion resolved
      // against the index vocabulary must match the corpus expansion
      val inlineF = rows(Search.bm25ClassicScores(view, "product_id",
        fields, "chocolat"))
      val servedF = rows(Search.bm25ClassicScoresFromIndex(spark,
        "bm25_spec_post", "bm25_spec_df", "bm25_spec_stats", fields,
        "chocolat"))
      assert(servedF.nonEmpty)
      assert(servedF.toSeq === inlineF.toSeq)
    } finally Seq("bm25_spec_post", "bm25_spec_df", "bm25_spec_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("bm25Search builder is lazy (no job at construction)") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = Search.bm25Search(
      Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("b"))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, "constructing bm25Search must not run a job")
    assert(df.count() === 2L)
  }

  test("idfSearch builder is lazy (no job at construction)") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = Search.idfSearch(
      Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("b"))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, "constructing idfSearch must not run a job")
    assert(df.count() === 2L)
  }

  test("hybridRrf fuses the engine's own BM25 and kNN rankings; both-list docs sum") {
    import graft.ops.Similarity
    val docs = Seq(
      (0L, "spark spark engine"), (1L, "spark only"),
      (2L, "nothing relevant here"), (3L, "spark table join"))
      .toDF("doc_id", "text")
    def v(xs: Float*) = xs.toSeq
    val corpus = Similarity.prepared(Seq(
        (0L, v(1f, 0f)), (1L, v(0f, 1f)), (2L, v(0.9f, 0.1f)),
        (3L, v(-1f, 0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val qv = Similarity.prepared(Seq((9L, v(1f, 0f)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding")
    val toks = Seq("spark", "table")
    // expected fusion from the CONSTITUENT rankings the engine itself
    // produces (each constituent has its own oracle-gated tests)
    val bmRank = graft.search.Search.bm25Search(docs, "doc_id", "text", toks)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }.map(_._1).toSeq
    val vecRank = Similarity.knnBrute(corpus, qv, 4)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    val want = (bmRank.zipWithIndex.map { case (id, i) =>
        id -> (1000000L / (60 + i + 1)) } ++
      vecRank.zipWithIndex.map { case (id, i) =>
        id -> (1000000L / (60 + i + 1)) })
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wantTop = want.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(3).zipWithIndex.map { case ((id, s), i) => (id, s, i + 1L) }
    val got = graft.search.Search.hybridRrf(docs, "doc_id", "text", toks,
        corpus, qv, n = 4, k = 3)
      .orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    assert(got === wantTop)
    // doc 2 is lexically irrelevant but vector-close: it must appear
    // with a single-list contribution
    assert(want.contains(2L) && !bmRank.contains(2L))
    intercept[IllegalArgumentException] {
      graft.search.Search.hybridRrf(docs, "doc_id", "text", toks,
        corpus, qv, n = 2, k = 3)
    }
  }
}
