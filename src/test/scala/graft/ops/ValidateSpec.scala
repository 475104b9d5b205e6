package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Validate._

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame,
                     checks: Seq[Check]) =
    Validate.validate(df, checks).collect()
      .map(r => r.getAs[String]("check") ->
        ((r.getAs[Long]("n_eval"), r.getAs[Long]("n_bad"),
          r.getAs[Boolean]("passed")))).toMap

  test("each check counts exactly its planted violations; nulls belong to NotNull alone") {
    val df = Seq(
      (Some(1L), Some(5.0), Some("A"), "ok"),
      (Some(2L), Some(500.0), Some("A"), "ok"),  // range violation
      (Some(2L), Some(6.0), Some("X"), "ok"),    // dup key + bad set value
      (None, None, None, "bad-regex!")           // nulls + regex violation
    ).toDF("id", "x", "flag", "s")
    val r = report(df, Seq(
      NotNull("id"),
      Unique(Seq("id")),
      InRange("x", 0, 100),
      OneOf("flag", Seq("A", "B")),
      MatchesRegex("s", "^[a-z]+$"),
      SizeBetween(1, 10)))
    assert(r("not_null(id)") === ((4L, 1L, false)))
    // 4 rows, 3 distinct id values (1, 2, NULL) -> 1 duplicate surplus
    assert(r("unique(id)") === ((4L, 1L, false)))
    // NULL x is NOT a range violation (n_eval = non-null count)
    assert(r("in_range(x,0.0,100.0)") === ((3L, 1L, false)))
    assert(r("one_of(flag)") === ((3L, 1L, false)))
    assert(r("regex(s)") === ((4L, 1L, false)))
    assert(r("size(1,10)") === ((4L, 0L, true)))
  }

  test("clean data passes everything; empty table is all-pass except size") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val ok = report(df, Seq(NotNull("id"), Unique(Seq("id")),
      MatchesRegex("s", "^[a-z]$"), SizeBetween(1, 5)))
    assert(ok.values.forall(_._3 === true))
    val empty = df.limit(0)
    val er = report(empty, Seq(NotNull("id"), InRange("id", 0, 9),
      SizeBetween(1, 5)))
    assert(er("not_null(id)") === ((0L, 0L, true)))
    assert(er("in_range(id,0.0,9.0)") === ((0L, 0L, true)))
    assert(er("size(1,5)") === ((0L, 1L, false)))
  }

  test("kAnonymityClasses: small classes flagged, nulls form a class, k guard") {
    val df = Seq(
      (Some(1), "A"), (Some(1), "A"), (Some(1), "A"), // size 3: safe at k=3
      (Some(2), "A"), (Some(2), "A"),                 // size 2: violates
      (Some(3), "B"),                                 // size 1: violates
      (None, "B"), (None, "B"))                       // null QI class, size 2
      .toDF("zip", "seg")
    val got = Validate.kAnonymityClasses(df, Seq("zip", "seg"), k = 3L)
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set((Some(2), "A", 2L), (Some(3), "B", 1L),
      (None, "B", 2L)))
    // a k-anonymous table yields an empty report
    assert(Validate.kAnonymityClasses(df, Seq("seg"), k = 3L)
      .count() === 0L)
    intercept[IllegalArgumentException] {
      Validate.kAnonymityClasses(df, Seq("zip"), k = 1L)
    }
  }

  test("withViolations: per-row reasons in suite order; table-scoped checks rejected") {
    val df = Seq(
      (Some(1L), Some(10.0), "A"),   // clean
      (None, Some(10.0), "A"),       // null key only
      (Some(2L), Some(99.0), "X"),   // range + set
      (Some(3L), None, "A"))         // null value: NOT a range violation
      .toDF("id", "v", "flag")
    val checks = Seq(Validate.NotNull("id"),
      Validate.InRange("v", 0, 50), Validate.OneOf("flag", Seq("A", "B")))
    val got = Validate.withViolations(df, checks)
      .select($"id", $"_violations").collect()
      .map(r => (Option(r.get(0)), r.getSeq[String](1).toList)).toMap
    assert(got(Some(1L)) === Nil)
    assert(got(None) === List("not_null(id)"))
    assert(got(Some(2L)) ===
      List("in_range(v,0.0,50.0)", "one_of(flag)")) // suite order
    assert(got(Some(3L)) === Nil) // NULL belongs to NotNull alone
    intercept[IllegalArgumentException] {
      Validate.withViolations(df, Seq(Validate.Unique(Seq("id"))))
    }
    intercept[IllegalArgumentException] {
      Validate.withViolations(df, Seq(Validate.SizeBetween(1, 10)))
    }
  }

  test("kAnonymityPartials + serveKAnonymity == one-shot audit on any segmentation (property)") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(7), Seq("A", "B", "C")(rnd.nextInt(3)))
    }
    for (nSeg <- Seq(1, 3, 10)) {
      val df = rows.map { case (id, zip, seg) =>
        (id, zip, seg, id % nSeg) }.toDF("id", "zip", "mkt", "ingest")
      val partials = Validate.kAnonymityPartials(df, "ingest",
        Seq("zip", "mkt"))
      val served = Validate.serveKAnonymity(partials, Seq("zip", "mkt"),
          k = 15L)
        .as[(Int, String, Long)].collect().toSet
      val batch = Validate.kAnonymityClasses(
          df.drop("ingest"), Seq("zip", "mkt"), k = 15L)
        .as[(Int, String, Long)].collect().toSet
      assert(served === batch, s"nSeg=$nSeg")
      assert(batch.nonEmpty, "fixture must have violating classes")
    }
  }

  test("lDiversityClasses: size-adequate class with shared sensitive value flagged") {
    // class X: 4 rows but ONE sensitive value -> flagged at l=2;
    // class Y: 2 rows, 2 values -> diverse, absent
    val df = Seq(
      ("X", "flu"), ("X", "flu"), ("X", "flu"), ("X", "flu"),
      ("Y", "flu"), ("Y", "ok")).toDF("qi", "diag")
    val got = Validate.lDiversityClasses(df, Seq("qi"), "diag", l = 2L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("X", 4L, 1L)))
  }

  test("lDiversityPartials + serveLDiversity == one-shot audit on any segmentation (property)") {
    // the q210 pattern for the diversity audit: sum-merge sizes,
    // distinct-merge sensitive values; NULL sensitive rows count
    // toward class size but never toward diversity
    val rnd = new scala.util.Random(31)
    // planted violator: zip 99 is size-adequate (8 rows spanning
    // segments) but monotone in its sensitive value
    val rows = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(7),
        if (rnd.nextInt(10) == 0) None
        else Some(Seq("A", "B", "C", "D")(rnd.nextInt(4))))
    } ++ (301 to 308).map(i => (i.toLong, 99, Some("A")))
    for (nSeg <- Seq(1, 3, 10)) {
      val df = rows.map { case (id, zip, sv) =>
        (id, zip, sv, id % nSeg) }.toDF("id", "zip", "sv", "ingest")
      val partials = Validate.lDiversityPartials(df, "ingest",
        Seq("zip"), "sv")
      val served = Validate.serveLDiversity(partials, Seq("zip"),
          "sv", l = 4L)
        .as[(Int, Long, Long)].collect().toSet
      val batch = Validate.lDiversityClasses(
          df.drop("ingest"), Seq("zip"), "sv", l = 4L)
        .as[(Int, Long, Long)].collect().toSet
      assert(served === batch, s"nSeg=$nSeg")
      assert(batch.nonEmpty, "fixture must have violating classes")
    }
  }

  test("refIntegrityReport/orphanRows: planted orphans counted; NULL fk excluded; clean table ok") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val r = Validate.refIntegrityReport(child, "fk", parent, "pk")
      .as[(String, Long, Long, Long, Boolean)].collect().head
    assert(r === (("ref_integrity(fk -> pk)", 4L, 2L, 500000L, false)))
    val o = Validate.orphanRows(child, "fk", parent, "pk")
      .as[Long].collect().toSeq
    assert(o === Seq(9L, 9L))
    // clean child: ok = true, 0 ppm; duplicate parent keys don't
    // multiply child rows
    val dupParent = Seq(1L, 1L, 2L).toDF("pk")
    val clean = Seq(1L, 1L, 2L).toDF("fk")
    val r2 = Validate.refIntegrityReport(clean, "fk", dupParent, "pk")
      .as[(String, Long, Long, Long, Boolean)].collect().head
    assert(r2 === (("ref_integrity(fk -> pk)", 3L, 0L, 0L, true)))
    // all-NULL child: n_eval 0, ppm 0 (no division by zero)
    val nulls = Seq(Option.empty[Long]).toDF("fk")
    val r3 = Validate.refIntegrityReport(nulls, "fk", parent, "pk")
      .as[(String, Long, Long, Long, Boolean)].collect().head
    assert(r3._2 === 0L && r3._4 === 0L && r3._5)
  }

  test("tClosenessClasses: hand-computed TVD; absent values count; NULL sensitive excluded") {
    // global (non-NULL): A=6, B=2 over n=8 -> rates 750000 / 250000 ppm
    // class X (4 rows, all A): |1e6-750000| + |0-250000| = 500000 -> tvd 250000
    // class Y (4 rows, 2A+2B): |500000-750000| + |500000-250000| -> tvd 250000
    //   ...with a NULL-sensitive row that must not change Y's distribution
    val df = Seq(
      ("X", Some("A")), ("X", Some("A")), ("X", Some("A")), ("X", Some("A")),
      ("Y", Some("A")), ("Y", Some("A")), ("Y", Some("B")), ("Y", Some("B")),
      ("Y", None)).toDF("qi", "s")
    val got = Validate.tClosenessClasses(df, Seq("qi"), "s", tPpm = 200000L)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("X", 4L, 250000L), ("Y", 4L, 250000L)))
    // tighten nothing out / loosen everything out
    assert(Validate.tClosenessClasses(df, Seq("qi"), "s", 250000L)
      .count() === 0L, "strict > threshold")
    // a class that exactly mirrors the global distribution has tvd 0
    val mirror = Seq(("Z", "A"), ("Z", "A"), ("Z", "A"), ("Z", "B"))
      .toDF("qi", "s")
    val all = df.select($"qi", $"s").unionByName(mirror)
    val z = Validate.tClosenessClasses(all, Seq("qi"), "s", 0L)
      .filter($"qi" === "Z").collect()
    assert(z.isEmpty, "mirror-of-global class sits at tvd 0, never flagged")
  }

  test("lDiversityPartials + serveTCloseness == one-shot audit on any segmentation (property)") {
    // ONE stored asset, TWO audits: the t-closeness serve consumes the
    // l-diversity partial verbatim; sum-merge makes it exact under any
    // segmentation
    val rnd = new scala.util.Random(47)
    val rows = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(6),
        if (rnd.nextInt(12) == 0) None
        else Some(Seq("A", "B", "C")(rnd.nextInt(3))))
    } ++ (401 to 412).map(i => (i.toLong, 99, Some("A"))) // skewed class
    for (nSeg <- Seq(1, 4, 9)) {
      val df = rows.map { case (id, zip, sv) =>
        (id, zip, sv, id % nSeg) }.toDF("id", "zip", "sv", "ingest")
      val partials = Validate.lDiversityPartials(df, "ingest",
        Seq("zip"), "sv")
      val served = Validate.serveTCloseness(partials, Seq("zip"),
          "sv", tPpm = 100000L)
        .as[(Int, Long, Long)].collect().toSet
      val batch = Validate.tClosenessClasses(
          df.drop("ingest"), Seq("zip"), "sv", tPpm = 100000L)
        .as[(Int, Long, Long)].collect().toSet
      assert(served === batch, s"nSeg=$nSeg")
      assert(batch.nonEmpty, "fixture must have violating classes")
    }
  }

  test("fdViolations: clean FD empty; NULL rhs counts as a value; quarantine matches") {
    import org.apache.spark.sql.functions._
    val clean = Seq((1L, "A"), (1L, "A"), (2L, "B")).toDF("k", "v")
    assert(Validate.fdViolations(clean, Seq("k"), Seq("v")).count() === 0L)
    val dirty = Seq((1L, "A"), (1L, "B"), (2L, "B"), (2L, "B"),
      (3L, "C"), (3L, null.asInstanceOf[String])).toDF("k", "v")
    val got = Validate.fdViolations(dirty, Seq("k"), Seq("v"))
      .as[(Long, Long, Long)].collect().toSet
    // key 3: NULL is a DISTINCT rhs value (bare count-distinct would
    // report n_rhs = 1 and hide the violation)
    assert(got === Set((1L, 2L, 2L), (3L, 2L, 2L)))
    val rows = Validate.fdViolatingRows(dirty, Seq("k"), Seq("v"))
      .select($"k").as[Long].collect().sorted.toSeq
    assert(rows === Seq(1L, 1L, 3L, 3L))
    // guards: overlapping lhs/rhs and empty sides rejected
    intercept[IllegalArgumentException] {
      Validate.fdViolations(dirty, Seq("k"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Validate.fdViolations(dirty, Seq.empty, Seq("v"))
    }
    // partials: segmentCol must be disjoint from lhs and rhs (a
    // segment inside rhs would over-report n_rhs at serve)
    intercept[IllegalArgumentException] {
      Validate.fdPartials(dirty.withColumn("_seg",
        org.apache.spark.sql.functions.lit(0L)), "v", Seq("k"), Seq("v"))
    }
  }


  test("serveFd over partials equals fdViolations under any segmentation (distinct-union law)") {
    import org.apache.spark.sql.functions._
    val dirty = Seq((1L, "A"), (1L, "B"), (2L, "B"), (2L, "B"),
      (3L, "C"), (3L, null.asInstanceOf[String])).toDF("k", "v")
    val want = Validate.fdViolations(dirty, Seq("k"), Seq("v"))
      .as[(Long, Long, Long)].collect().toSet
    // segmentations chosen so a violator's rhs values SPLIT across
    // segments (the merge must reassemble them) and so duplicate
    // (k, v) rows land in different segments (sum law)
    val segmentations: Seq[Seq[Seq[Int]]] = Seq(
      Seq(Seq(0, 2, 4), Seq(1, 3, 5)),
      Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4), Seq(5)),
      Seq(Seq(0, 1, 2, 3, 4, 5)))
    val rows = dirty.collect()
    for (segs <- segmentations) {
      val partials = segs.zipWithIndex.map { case (idx, i) =>
        val part = spark.createDataFrame(
          spark.sparkContext.parallelize(idx.map(rows)), dirty.schema)
        Validate.fdPartials(part.withColumn("_seg", lit(i.toLong)),
          "_seg", Seq("k"), Seq("v"))
      }.reduce(_ unionByName _)
      val got = Validate.serveFd(partials, Seq("k"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want, s"segmentation $segs diverged")
    }
  }

}
