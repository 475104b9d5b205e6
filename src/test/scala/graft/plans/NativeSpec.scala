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

  test("JaroWinkler: DuckDB-parity on the pinned vector table") {
    // expected values generated from DuckDB 1.0 jaro_winkler_similarity
    // (classics + 25 seeded random pairs) — pins the full semantics:
    // window, greedy matching, transpositions, 0.7 boost threshold,
    // prefix cap 4, empty -> 0.
    val vectors = Seq(
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("abc", "xyz", 0.0),
      ("ab", "ba", 0.0),
      ("a", "", 0.0),
      ("", "", 0.0),
      ("same", "same", 1.0),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("ab", "abcdefgh", 0.8),
      ("aaaa", "aaab", 0.8833333333333334),
      ("TRATE", "TRACE", 0.9066666666666667),
      ("abcdefx", "abcdefy", 0.9428571428571428),
      ("small ring", "smal ring", 0.98),
      ("red bolt", "old bolt", 0.8333333333333334),
      ("aafcbbbfaff", "aedaaabbe", 0.6033670033670034),
      ("aebfffedbd", "c  a  bfdc", 0.6),
      ("bb ca", "da", 0.0),
      (" cec a", "deadaec fe c", 0.5),
      ("bfaafb ca ", " adc", 0.5666666666666667),
      ("f cbccbf", "fffae", 0.44166666666666665),
      ("befbbddcffe", "fc  ", 0.44696969696969696),
      ("b", " ", 0.0),
      ("dcabef", "bfddfd", 0.5555555555555555),
      ("cbb", "eecfededcbbe", 0.47222222222222215),
      ("a a abfb", "deaddedece ", 0.4053030303030303),
      ("f", "afe c fcacdb", 0.6944444444444443),
      ("affce be", " f", 0.5416666666666666),
      (" feeb", "c b", 0.5111111111111111),
      (" eaecdaac", "babea", 0.5333333333333333),
      ("fd", " e", 0.0),
      ("bfd", "bce edbe ", 0.6296296296296297),
      ("fbfcdffcdeda", "baca", 0.5555555555555555),
      ("ebebaaffab", "a ", 0.5333333333333333),
      ("aebcfd", "ebfe", 0.75),
      ("db d dbaaf", "cddd fa", 0.707936507936508),
      ("ffaadfc  ab", "bedb", 0.44696969696969696),
      ("bcdb ad", "aafe aa  ", 0.5026455026455027),
      ("bddd", " dab", 0.5),
      ("adc  dc", "ff effd", 0.5238095238095238))
    val got = vectors.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(Native.jaroWinkler($"a", $"b")).as[Double].collect()
    vectors.zip(got).foreach { case ((a, b, want), v) =>
      assert(math.abs(v - want) <= 1e-12,
        s"jw('$a','$b') = $v, DuckDB = $want")
    }
    // symmetry on the random half
    val sym = vectors.map { case (a, b, _) => (b, a) }.toDF("a", "b")
      .select(Native.jaroWinkler($"a", $"b")).as[Double].collect()
    vectors.zip(sym).foreach { case ((a, b, want), v) =>
      assert(math.abs(v - want) <= 1e-12, s"jw('$b','$a') asymmetric")
    }
    // interpreted eval must agree with codegen
    assert(org.apache.spark.sql.graftnative.JaroWinkler.compute(
      "DWAYNE".getBytes, "DUANE".getBytes) === 0.8400000000000001)
    // SQL registration via GraftExtensions name
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.graftnative.JaroWinkler(children.head, children(1)),
      "scala_udf")
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS s")
      .collect().head.getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) <= 1e-12)
  }

  test("NfcNormalize: composes decomposed sequences; ASCII untouched; dedup keys converge") {
    val deco = "e\u0301clair"  // decomposed: e + combining acute (7 cp)
    val comp = "\u00e9clair"   // composed e-acute (6 cp)
    val rows = Seq(deco, comp, "plain ascii",
      "a\u0308 + o\u0308")    // a/o + combining diaeresis compose
    val got = rows.toDF("s")
      .select(Native.nfcNormalize($"s"), length(Native.nfcNormalize($"s")))
      .as[(String, Int)].collect()
    assert(got(0) == ((comp, 6)))
    assert(got(1) == ((comp, 6)))
    assert(got(2) == (("plain ascii", 11)))
    assert(got(3) == (("\u00e4 + \u00f6", 5)))
    // the dedup-key argument: both spellings hash identically after
    val h = Seq(deco, comp).toDF("s")
      .select(md5(Native.nfcNormalize($"s"))).as[String].collect()
    assert(h(0) == h(1))
    // interpreted eval agrees with codegen
    assert(org.apache.spark.sql.graftnative.NfcNormalize.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(deco))
      .toString == comp)
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(Native.nfcNormalize($"s")).collect()
    assert(n.head.isNullAt(0))
  }

  // The composed per-word chain BpeMergeWord replaces, rebuilt from
  // public builtins (TextAnalysis' wordToSeq/seqSymbols are private;
  // U+001F is the format's pinned separator).
  private def composedBpe(word: org.apache.spark.sql.Column,
                          merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val S = "\u001f"
    val wrapped = regexp_replace(word, "(?s)(.)", S + "$1" + S)
    val applied = merges.foldLeft(wrapped) { case (c, (l, r)) =>
      replace(c, lit(S + l + S + S + r + S), lit(S + l + r + S))
    }
    when(char_length(word) < 2 || word.contains(lit(S)), array(word))
      .otherwise(filter(split(applied, S), x => x =!= ""))
  }

  test("BpeMergeWord: merge replay equals the replace chain on hand cases and random tables") {
    // hand cases: non-overlapping left-to-right scan (the merged
    // symbol is never the left half of a match in the same round),
    // chained merges, accents both spellings, supplementary pairs
    val hand = Seq(
      ("aaaa", Seq("a" -> "a")),          // -> [aa, aa]
      ("aaa", Seq("a" -> "a")),           // -> [aa, a]
      ("aaaaa", Seq("a" -> "a", "aa" -> "aa")), // -> [aaaa, a]
      ("abc", Seq("a" -> "b", "ab" -> "c")),    // -> [abc]
      ("abab", Seq("a" -> "b", "ab" -> "ab")),  // -> [abab]
      ("ababa", Seq("b" -> "a", "a" -> "ba")),  // chain into left-assoc
      ("état", Seq("e" -> "́")),     // combining mark merge
      ("état", Seq("é" -> "t")),
      ("😀😀", Seq("😀" -> "😀")),
      ("xy", Seq.empty[(String, String)]))
    for ((w, ms) <- hand) {
      val df = Seq(w).toDF("w")
      val nat = df.select(Native.bpeMerge($"w", ms)).as[Seq[String]].collect().head
      val cmp = df.select(composedBpe($"w", ms)).as[Seq[String]].collect().head
      assert(nat === cmp, s"word=$w merges=$ms")
    }
    // guard edges: empty, 1-char, 1-codepoint supplementary,
    // separator-bearing — all pass through as a single symbol
    val guards = Seq("", "x", "😀", "\u001f", "a\u001fb")
    val gdf = guards.toDF("w")
    val gms = Seq("a" -> "b")
    assert(gdf.select(Native.bpeMerge($"w", gms)).as[Seq[String]].collect().toSeq ===
      gdf.select(composedBpe($"w", gms)).as[Seq[String]].collect().toSeq)
    assert(gdf.select(Native.bpeMerge($"w", gms)).as[Seq[String]].collect().toSeq ===
      guards.map(Seq(_)))
    // randomized: progressive merge tables (later merges consume
    // earlier outputs, as trained tables do) over random short words
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val alpha = Seq("a", "b", "c")
      var symbols = alpha
      val ms = (1 to 2 + rnd.nextInt(8)).map { _ =>
        val l = symbols(rnd.nextInt(symbols.size))
        val r = symbols(rnd.nextInt(symbols.size))
        symbols = symbols :+ (l + r)
        (l, r)
      }
      val words = (1 to 30).map(_ =>
        Seq.fill(rnd.nextInt(13))(alpha(rnd.nextInt(3))).mkString)
      val df = words.toDF("w")
      val nat = df.select($"w", Native.bpeMerge($"w", ms))
        .as[(String, Seq[String])].collect().toMap
      val cmp = df.select($"w", composedBpe($"w", ms))
        .as[(String, Seq[String])].collect().toMap
      assert(nat === cmp, s"trial=$trial merges=$ms")
    }
    // null propagates
    val n = Seq[Option[String]](None).toDF("w")
      .select(Native.bpeMerge($"w", Seq("a" -> "b"))).collect()
    assert(n.head.isNullAt(0))
    // interpreted eval agrees with codegen
    val expr = org.apache.spark.sql.graftnative.BpeMergeWord(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      Seq("a" -> "a"))
    val got = expr.eval(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("aaaa")))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(got.toSeq[org.apache.spark.unsafe.types.UTF8String](
      org.apache.spark.sql.types.StringType).map(_.toString) === Seq("aa", "aa"))
  }

  test("bpeSegment(native = true) equals the composed segmenter on a trained table") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer new newest wider wide"),
      (3L, "état état etat"),
      (4L, ""),
      (5L, "a bb ccc dddd")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 8)
    val a = TextAnalysis.bpeSegment(docs, "doc_id", "text", merges)
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    val b = TextAnalysis.bpeSegment(docs, "doc_id", "text", merges,
        native = true)
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(a === b)
    assert(a.map(_._1) === Seq(1L, 2L, 3L, 4L, 5L))
    assert(a(3)._2.isEmpty) // empty doc -> empty symbol run, both paths
  }
}
