package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextAnalysis

class NativeSpec extends SparkSpec {
  import spark.implicits._

  test("HammingDistance: codegen and interpreted eval agree with the composed form") {
    val d = Seq(
      ("1010", "1110"), ("0000", "1111"), ("", ""),
      ("101", "1010"), ("abcdef", "abcxef")).toDF("a", "b")
    val native = d.select(Native.hamming($"a", $"b")).as[Long].collect().toSeq
    assert(native === Seq(1L, 4L, 0L, 1L, 1L))
    // equal-length ASCII inputs: identical to the composed Column form
    val eq = d.filter(length($"a") === length($"b"))
    val composed = eq.select(TextAnalysis.hamming($"a", $"b", 6))
      .as[Long].collect().toSeq
    val nat = eq.select(Native.hamming($"a", $"b")).as[Long].collect().toSeq
    assert(nat === composed)
    // interpreted path (no codegen) must agree
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("1010"),
      org.apache.spark.unsafe.types.UTF8String.fromString("1110"))
    val expr = org.apache.spark.sql.graftnative.HammingDistance(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.StringType, nullable = true))
    assert(expr.eval(row) === 1L)
  }

  test("native shingle/minhash/simhash/minMd5 agree with the composed built-in forms") {
    // Randomized corpus incl. edge cases: empty, single-token, exactly
    // k tokens, repeated shingles, accents/punctuation.
    val rnd = new scala.util.Random(42)
    val words = Seq("the", "cat", "sat", "on", "mat", "été", "naïve", "x1", "—")
    val docs = (Seq("", "one", "one two", "one two three",
      "a b a b a b a b") ++
      (1 to 40).map(_ => Seq.fill(3 + rnd.nextInt(30))(
        words(rnd.nextInt(words.length))).mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    val toks = TextAnalysis.toks($"text")
    // distinctShingles == array_distinct(shingles)
    val composedSh = docs.select($"doc_id",
      array_distinct(TextAnalysis.shingles(toks, 3)).as("shs"))
      .orderBy($"doc_id").collect().toSeq
    val nativeSh = docs.select($"doc_id",
      Native.distinctShingles(toks, 3).as("shs"))
      .orderBy($"doc_id").collect().toSeq
    assert(nativeSh.map(_.toString) === composedSh.map(_.toString))

    // minhashBandKeys == withMinhashSignature + band md5 composition
    val sets = graft.ops.Dedup.shingleSets(docs, "doc_id", "text", 3)
      .filter(size($"shs") > 0)
    val sigs = graft.ops.Dedup.withMinhashSignature(sets, 8)
    val composedKeys = sigs.select($"doc_id",
      (0 until 4).map(b =>
        md5(concat_ws("|", col(s"sig${2 * b}"), col(s"sig${2 * b + 1}"))))
        .reduce((a, b) => concat(a, lit(","), b)).as("keys"))
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    val nativeKeys = sets.select($"doc_id",
      array_join(Native.minhashBandKeys($"shs", 4, 2), ",").as("keys"))
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    assert(nativeKeys === composedKeys)

    // native simhash == composed per-bit aggregate chain
    val mds = docs.select($"doc_id",
      transform(toks, t => md5(t)).as("mds")).filter(size($"mds") > 0)
    val composedSim = mds.select($"doc_id",
      TextAnalysis.simhash($"mds", 64).as("fp"))
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    val nativeSim = mds.select($"doc_id",
      Native.simhash($"mds", 64).as("fp"))
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    assert(nativeSim === composedSim)

    // native minMd5 == array_min(transform(md5)); null on empty array
    val composedMin = docs.select($"doc_id",
      array_min(transform(Native.distinctShingles(toks, 5), s => md5(s))))
      .orderBy($"doc_id").as[(Long, Option[String])].collect().toSeq
    val nativeMin = docs.select($"doc_id",
      Native.minMd5(Native.distinctShingles(toks, 5)))
      .orderBy($"doc_id").as[(Long, Option[String])].collect().toSeq
    assert(nativeMin === composedMin)
  }

  test("textStats-based langId/quality are bit-identical to the composed forms") {
    val rnd = new scala.util.Random(99)
    val words = Seq("the", "of", "le", "la", "der", "und", "el", "que",
      "的", "是", "cat", "Été", "naïve", "x9", "zzz")
    val docs = (Seq("", "the", "the the the", "le la le est",
      "mixed the le der el 的") ++
      (1 to 50).map(_ => Seq.fill(1 + rnd.nextInt(40))(
        words(rnd.nextInt(words.length))).mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val toks = TextAnalysis.toks($"text")
    val composed = docs.select($"doc_id",
      TextAnalysis.langId(toks).as("lang"),
      TextAnalysis.qualityScore($"text").as("q"))
      .orderBy($"doc_id").as[(Long, String, Double)].collect().toSeq
    val viaStats = docs
      .select($"doc_id", $"text", TextAnalysis.textStats(toks).as("_st"))
      .select($"doc_id",
        TextAnalysis.langIdFromStats($"_st.hits").as("lang"),
        TextAnalysis.qualityScoreFromStats($"text", $"_st").as("q"))
      .orderBy($"doc_id").as[(Long, String, Double)].collect().toSeq
    // exact double comparison on purpose: same IEEE tree, same inputs
    assert(viaStats === composed)
  }

  test("LevenshteinThresholdRule rewrites bounded comparisons, same results") {
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    val df = Seq(("kitten", "sitting"), ("abc", "abd"), ("x", "zzzzz"))
      .toDF("a", "b").filter(levenshtein($"a", $"b") <= 2)
    val before = df.queryExecution.analyzed
    val after = org.apache.spark.sql.graftnative.LevenshteinThresholdRule(before)
    val hasThreshold = after.expressions.exists(_.exists {
      case Levenshtein(_, _, Some(_)) => true
      case _ => false
    })
    assert(hasThreshold, s"rule did not rewrite:\n$after")
    // idempotent: a second application changes nothing
    assert(org.apache.spark.sql.graftnative.LevenshteinThresholdRule(after)
      .fastEquals(after))
    // bounded and unbounded forms agree
    val unbounded = Seq(("kitten", "sitting"), ("abc", "abd"), ("x", "zzzzz"))
      .toDF("a", "b")
      .select(($"a" === $"a") && (levenshtein($"a", $"b") <= 2))
      .as[Boolean].collect().toSeq
    val bounded = Seq(("kitten", "sitting"), ("abc", "abd"), ("x", "zzzzz"))
      .toDF("a", "b")
      .select(levenshtein($"a", $"b", 2) >= 0)
      .as[Boolean].collect().toSeq
    assert(unbounded === bounded)
  }

  test("GraftExtensions registers graft_hamming for SQL use") {
    // the extensions object accepts the injection without error
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // and the same builder registered on a session resolves in SQL
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hamming"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.graftnative.HammingDistance].getName, "graft_hamming"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.graftnative.HammingDistance(children.head, children(1)))
    val got = s2.sql("SELECT graft_hamming('1010', '1110') AS d")
      .collect().head.getLong(0)
    assert(got === 1L)
  }
}
