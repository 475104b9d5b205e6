package graft
package ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ/
  * Great-Expectations operator every ingestion pipeline runs before
  * anything downstream trusts a drop (Schelter et al., "Automating
  * large-scale data quality verification", VLDB'18): a list of checks
  * is compiled into ONE aggregate pass over the table, and the report
  * is a row per check with the violation count, the evaluated-row
  * count, the violation fraction and the verdict.
  *
  * Scale shape: all row-level checks (null / range / set / regex) are
  * conditional-sum aggregates fused into a single partial+final pass —
  * adding a check adds a column, never a scan. Uniqueness checks
  * compile to `count(*) − countDistinct(...)` in the same aggregate;
  * each distinct adds an Expand duplication of the shuffle input (the
  * q10 lesson), so keep uniqueness checks few — they are the one check
  * class whose cost is not free. Regexes are restricted by convention
  * to the Java∩RE2 subset (the [[TextAnalysis]] rule) so an external
  * engine replays them verbatim.
  *
  * Violation semantics: NULLs belong to `NotNull` alone — a NULL never
  * counts against a range/set/regex check (`n_eval` is the non-null
  * count there), so one broken column yields one diagnosis, not four.
  */
object Validate {

  sealed trait Check { def name: String }
  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }
  /** The (cols...) combination must not repeat. */
  final case class Unique(cols: Seq[String]) extends Check {
    require(cols.nonEmpty, "Unique needs at least one column")
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Non-null values of `col` must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double)
      extends Check {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Non-null values of `col` must be one of `allowed`. */
  final case class OneOf(col: String, allowed: Seq[String]) extends Check {
    require(allowed.nonEmpty, "OneOf needs at least one allowed value")
    def name = s"one_of($col)"
  }
  /** Non-null values of `col` must match `re` (Java∩RE2 syntax). */
  final case class MatchesRegex(col: String, re: String) extends Check {
    def name = s"regex($col)"
  }
  /** Table row count must lie in [lo, hi]. */
  final case class SizeBetween(lo: Long, hi: Long) extends Check {
    def name = s"size($lo,$hi)"
  }

  private def violations(c: Check): Column = c match {
    case NotNull(col0) => count(lit(1)) - count(col(col0))
    case Unique(cols) =>
      count(lit(1)) - countDistinct(struct(cols.map(col): _*))
    case InRange(col0, lo, hi) =>
      sum(when(col(col0).isNotNull &&
        !col(col0).between(lo, hi), 1L).otherwise(0L))
    case OneOf(col0, allowed) =>
      sum(when(col(col0).isNotNull &&
        !col(col0).isin(allowed: _*), 1L).otherwise(0L))
    case MatchesRegex(col0, re) =>
      sum(when(col(col0).isNotNull &&
        !col(col0).rlike(re), 1L).otherwise(0L))
    case SizeBetween(lo, hi) =>
      when(count(lit(1)).between(lo, hi), 0L).otherwise(1L)
  }

  /** Row-level violation predicate of a ROW-SCOPED check (NULLs stay
    * [[NotNull]]'s business, as in the aggregate suite). Table-scoped
    * checks ([[Unique]], [[SizeBetween]]) have no per-row meaning and
    * are rejected by [[withViolations]].
    */
  private def rowViolates(c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && !col(col0).between(lo, hi)
    case OneOf(col0, allowed) =>
      col(col0).isNotNull && !col(col0).isin(allowed: _*)
    case MatchesRegex(col0, re) =>
      col(col0).isNotNull && !col(col0).rlike(re)
    case other => throw new IllegalArgumentException(
      s"withViolations: ${other.name} is table-scoped — row-level " +
        "routing accepts NotNull / InRange / OneOf / MatchesRegex only")
  }

  private def evaluated(c: Check): Column = c match {
    case NotNull(_) | Unique(_) | SizeBetween(_, _) => count(lit(1))
    case InRange(col0, _, _) => count(col(col0))
    case OneOf(col0, _) => count(col(col0))
    case MatchesRegex(col0, _) => count(col(col0))
  }

  /** Run the suite: one row per check —
    * (check, n_eval, n_bad, bad_frac, passed), in `checks` order.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(violations(c).cast("long").as(s"_bad$i"),
        evaluated(c).cast("long").as(s"_n$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"),
        col(s"_n$i").as("n_eval"),
        coalesce(col(s"_bad$i"), lit(0L)).as("n_bad"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select($"r.check", $"r.n_eval", $"r.n_bad",
        when($"r.n_eval" === 0L, lit(0.0))
          .otherwise($"r.n_bad".cast("double") / $"r.n_eval".cast("double"))
          .as("bad_frac"),
        ($"r.n_bad" === 0L).as("passed"))
  }

  /** Dead-letter ROUTING — the row-level production face of the
    * aggregate suite: every row gains a `_violations` array naming the
    * checks it fails (empty = clean), so one scan splits an ingest
    * batch into the pipeline and the quarantine
    * (`filter(size($"_violations") === 0)` vs `> 0`) WITH reasons
    * attached — the aggregate report says how broken a drop is, this
    * says which rows and why. Row-scoped checks only ([[NotNull]] /
    * [[InRange]] / [[OneOf]] / [[MatchesRegex]]); [[Unique]] /
    * [[SizeBetween]] are table-scoped and rejected. Check-name order
    * in the array = `checks` order (deterministic, oracle-friendly).
    * Pure per-row Column expressions: one map-only projection, zero
    * shuffle — the q192 shape every per-row gate must keep at 100 TB
    * (the HOF-built array evaluates interpreted, outside codegen).
    */
  def withViolations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val tagged = checks.map(c => when(rowViolates(c), lit(c.name)))
    df.withColumn("_violations",
      filter(array(tagged: _*), x => x.isNotNull))
  }

  // ------------------------------------------------------ privacy audits

  /** k-anonymity audit (Sweeney, "k-Anonymity: a model for protecting
    * privacy", IJUFKS 2002): rows group into EQUIVALENCE CLASSES by
    * the quasi-identifier columns; a class with fewer than `k` members
    * re-identifies them (the QI combination singles the rows out) —
    * the release-side complement of [[TextAnalysis.redactPii]]'s
    * content-side scrub. Returns the VIOLATING classes
    * (qiCols…, class_size); empty result = the table is k-anonymous
    * over these QIs. NULL QI values form their own class (groupBy
    * semantics — a NULL combination is as linkable as any other).
    *
    * Scale shape: one grouped count on the QI key (map-side combined,
    * the only shuffle) + a filter; class count is bounded by the QI
    * domain, not the row count.
    */
  def kAnonymityClasses(df: DataFrame, qiCols: Seq[String],
                        k: Long): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityClasses needs at least one QI column")
    require(k >= 2L, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter($"class_size" < k)
  }

  /** The STORED partial of [[kAnonymityClasses]] — the q145/q188
    * maintenance axis applied to the privacy audit: per (`segmentCol`,
    * qiCols…) class counts, one corpus pass per ingest segment,
    * partial-sized output. Counts are plain sums, so the serve-side
    * merge is exact by associativity — "is the RELEASE (everything
    * ingested so far) k-anonymous?" never re-scans history.
    */
  def kAnonymityPartials(df: DataFrame, segmentCol: String,
                         qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityPartials needs at least one QI column")
    df.groupBy((segmentCol +: qiCols).map(col): _*)
      .agg(count(lit(1)).as("_n"))
  }

  /** Serve the release-level k-anonymity audit from stored partials:
    * sum-merge per QI class, filter &lt; k — equal to
    * [[kAnonymityClasses]] over the raw union by sum associativity
    * (ValidateSpec property; q210 runs it under q205's oracle
    * verbatim). Touches segments × classes rows, never the corpus.
    */
  def serveKAnonymity(partials: DataFrame, qiCols: Seq[String],
                      k: Long): DataFrame = {
    require(qiCols.nonEmpty, "serveKAnonymity needs at least one QI column")
    require(k >= 2L, s"k must be >= 2, got $k")
    partials.groupBy(qiCols.map(col): _*)
      .agg(sum(col("_n")).as("class_size"))
      .filter($"class_size" < k)
  }

  /** l-diversity audit (Machanavajjhala et al., "l-Diversity: privacy
    * beyond k-anonymity", TKDD 2007): within each QI class the
    * SENSITIVE attribute must take at least `l` distinct values — a
    * class of adequate SIZE still leaks when its members share the
    * sensitive value (and a small crowd, e.g. an (event_type, hour)
    * slice touched by under `l` distinct users, pins those users).
    * Returns the violating classes (qiCols…, class_size,
    * n_sensitive). Cost note: the countDistinct adds an Expand
    * duplication of the shuffle input (the q10 / [[Unique]] lesson) —
    * one sensitive column per pass, not a list.
    */
  def lDiversityClasses(df: DataFrame, qiCols: Seq[String],
                        sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "lDiversityClasses needs at least one QI column")
    require(l >= 2L, s"l must be >= 2, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .filter($"n_sensitive" < l)
  }

  /** The STORED partial of [[lDiversityClasses]] (VERDICT r12 Next #3
    * — the q210 maintenance axis extended to the diversity audit):
    * per (`segmentCol`, qiCols…, sensitive value) row counts. Two
    * merge laws make the serve exact under ANY segmentation: the
    * class size is the SUM of `_n` (plain associativity, q210's law)
    * and the distinct sensitive count is the count of DISTINCT
    * sensitive values across partials (distinct-union is idempotent
    * and associative — a value seen in three segments is still one
    * value). One corpus pass per ingest segment; output is bounded by
    * segments × QI classes × sensitive domain, not the row count.
    * NULL sensitive values keep their own partial row but must not
    * count toward diversity (countDistinct ignores NULL) — the serve
    * filters them out of `n_sensitive` exactly as the one-shot audit
    * does.
    */
  def lDiversityPartials(df: DataFrame, segmentCol: String,
                         qiCols: Seq[String],
                         sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "lDiversityPartials needs at least one QI column")
    df.groupBy((segmentCol +: qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_n"))
  }

  /** Serve the release-level l-diversity audit from stored partials:
    * sum-merge sizes, distinct-merge sensitive values, filter &lt; l —
    * equal to [[lDiversityClasses]] over the raw union (ValidateSpec
    * property; the gate runs it under q206's oracle verbatim).
    * Touches segments × classes × sensitive-domain rows, never the
    * corpus.
    */
  def serveLDiversity(partials: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "serveLDiversity needs at least one QI column")
    require(l >= 2L, s"l must be >= 2, got $l")
    partials.groupBy(qiCols.map(col): _*)
      .agg(sum(col("_n")).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .filter($"n_sensitive" < l)
  }

  /** Referential-integrity audit — the CROSS-TABLE check the
    * single-table suite cannot express (Schelter et al.'s
    * isContainedIn against a reference table): every child foreign
    * key must exist in the parent's key set; a violating ("orphan")
    * child row references an entity that does not exist. NULL foreign
    * keys are excluded from evaluation (the suite's NotNull
    * discipline — one broken column yields one diagnosis). Returns
    * ONE report row (check, n_eval, n_orphans, orphan_ppm, ok);
    * [[orphanRows]] is the row face (the q209 dead-letter shape
    * across tables).
    *
    * Scale shape: the parent reduces to its DISTINCT key set
    * (broadcast when dimension-sized, AQE otherwise); ONE left join
    * feeds both counts (no second pass, no row multiplication — keys
    * are distinct on the build side); orphan_ppm in exact integer
    * division.
    */
  def refIntegrityReport(child: DataFrame, fkCol: String,
                         parent: DataFrame, pkCol: String): DataFrame = {
    val pk = parent.select(col(pkCol).as("_pk")).distinct()
    child.filter(col(fkCol).isNotNull)
      .join(pk, col(fkCol) === col("_pk"), "left")
      .agg(count(lit(1)).as("n_eval"),
        count(when(col("_pk").isNull, 1)).as("n_orphans"))
      .select(
        lit(s"ref_integrity($fkCol -> $pkCol)").as("check"),
        $"n_eval", $"n_orphans",
        when($"n_eval" === 0L, 0L)
          .otherwise(expr("n_orphans * 1000000 DIV n_eval"))
          .as("orphan_ppm"),
        ($"n_orphans" === 0L).as("ok"))
  }

  /** The violating child rows of [[refIntegrityReport]] — quarantine
    * with the same NULL semantics (NULL foreign keys pass through to
    * the NotNull check, not here). One LEFT ANTI join.
    */
  def orphanRows(child: DataFrame, fkCol: String,
                 parent: DataFrame, pkCol: String): DataFrame =
    child.filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as("_pk")).distinct(),
        col(fkCol) === col("_pk"), "left_anti")

  /** Functional-dependency audit — the cross-COLUMN constraint the
    * row-scoped suite ([[validate]]) and the cross-TABLE check
    * ([[refIntegrityReport]]) cannot express: does `lhs → rhs` hold,
    * i.e. does every lhs determinant value map to exactly ONE rhs
    * tuple? The denormalization-drift check every warehouse needs
    * (a nation key that maps to two nation names after a bad merge).
    * Returns the VIOLATING determinants:
    * (lhs..., n_rhs — distinct rhs tuples, n_rows — rows carrying
    * the determinant), n_rhs >= 2, ordered nowhere (callers sort).
    * NULL semantics: a NULL in lhs groups like any value (NULL
    * determinants are still determinants); a NULL in rhs is a
    * distinct tuple value (SQL count-distinct semantics would drop
    * it silently — this uses the struct form so NULL ≠ absent).
    *
    * Scale shape: ONE grouped aggregate on the determinant
    * (count_distinct over a struct is a partial+final aggregate, no
    * self-join); violating-row quarantine is a broadcast semi-join
    * back ([[fdViolatingRows]]).
    */
  def fdViolations(df: DataFrame, lhs: Seq[String],
                   rhs: Seq[String]): DataFrame = {
    require(lhs.nonEmpty && rhs.nonEmpty, "lhs and rhs must be non-empty")
    require(lhs.intersect(rhs).isEmpty,
      s"lhs and rhs overlap: ${lhs.intersect(rhs).mkString(", ")}")
    df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(struct(rhs.map(col): _*)).as("n_rhs"),
        count(lit(1)).as("n_rows"))
      .filter($"n_rhs" >= 2L)
  }

  /** The rows carrying a violating determinant of [[fdViolations]] —
    * the quarantine face: everything needed to adjudicate which rhs
    * is correct. One semi-join on the (usually tiny) violator set.
    */
  def fdViolatingRows(df: DataFrame, lhs: Seq[String],
                      rhs: Seq[String]): DataFrame =
    df.join(broadcast(fdViolations(df, lhs, rhs).select(lhs.map(col): _*)),
      lhs, "left_semi")

  /** The STORED partial of [[fdViolations]] — the
    * [[lDiversityPartials]] maintenance axis for the FD audit: per
    * (`segmentCol`, lhs…, rhs tuple) row counts. The same two merge
    * laws make the serve exact under ANY segmentation (sum for
    * n_rows, distinct-union for the rhs tuples), with ONE deliberate
    * difference from the diversity partial: the rhs is stored as a
    * STRUCT so a NULL rhs remains a counted value after the merge —
    * the same NULL discipline as the batch audit.
    */
  def fdPartials(df: DataFrame, segmentCol: String, lhs: Seq[String],
                 rhs: Seq[String]): DataFrame = {
    require(lhs.nonEmpty && rhs.nonEmpty, "lhs and rhs must be non-empty")
    require(lhs.intersect(rhs).isEmpty,
      s"lhs and rhs overlap: ${lhs.intersect(rhs).mkString(", ")}")
    // a segmentCol inside rhs would split partials per rhs value and
    // make serveFd count (rhs, segment) combinations — n_rhs silently
    // over-reported (round-14 review finding); inside lhs it would
    // fail later with an ambiguous reference. Fail here instead.
    require(!(lhs ++ rhs).contains(segmentCol),
      s"segmentCol '$segmentCol' must be disjoint from lhs and rhs")
    df.groupBy(col(segmentCol) +: lhs.map(col) :+
        struct(rhs.map(col): _*).as("_rhs"): _*)
      .agg(count(lit(1)).as("_n"))
  }

  /** Serve the FD audit from stored partials: sum-merge row counts,
    * distinct-merge rhs tuples, filter n_rhs >= 2 — equal to
    * [[fdViolations]] over the raw union under any segmentation
    * (ValidateSpec property; q248 runs it under q247's oracle).
    * Touches segments × determinants × rhs-domain rows, never the
    * corpus.
    */
  def serveFd(partials: DataFrame, lhs: Seq[String]): DataFrame = {
    require(lhs.nonEmpty, "serveFd needs at least one lhs column")
    partials.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col("_rhs")).as("n_rhs"),
        sum(col("_n")).as("n_rows"))
      .filter($"n_rhs" >= 2L)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, "t-Closeness:
    * privacy beyond k-anonymity and l-diversity", ICDE 2007) — the
    * third leg of the release-audit triad: a QI class can be large
    * ([[kAnonymityClasses]] passes) and diverse
    * ([[lDiversityClasses]] passes) yet still leak by SKEW — if 95%
    * of one nation-segment's members share a status that is rare
    * globally, membership in the class itself is informative. The
    * check: within each QI class, the distribution of the sensitive
    * attribute must sit within `tPpm` of the GLOBAL distribution
    * under total variation distance, computed in exact integer ppm
    * with [[Stats.distributionDriftWithEdges]]'s quantization
    * (per-value rates = count·10⁶ DIV total, TVD = Σ|Δ| DIV 2 —
    * engine-portable, no floating point; exact for counts ≤ ~9.2e12,
    * the same envelope the drift tier documents). Returns the
    * VIOLATING classes (qiCols…, class_size, tvd_ppm) with
    * tvd_ppm &gt; tPpm.
    *
    * Pinned semantics: NULL sensitive values are excluded from BOTH
    * distributions (the countDistinct discipline of
    * [[lDiversityClasses]]) — a class whose rows are all
    * NULL-sensitive has no distribution and is absent from the audit;
    * NULL QI combinations form their own class (groupBy semantics);
    * values ABSENT from a class still contribute their full global
    * rate to that class's TVD (the cross attach below — dropping
    * them would understate exactly the skew the audit exists to
    * catch).
    *
    * Scale shape: ONE grouped count on (QI, sensitive) is the only
    * corpus pass — SEALED behind the Materializer barrier (the Dedup
    * discipline: cls, the global table and the attach all consume it,
    * and without the barrier each branch re-scans the corpus — the
    * plan audit caught exactly that); the class-size and global-value
    * tables re-aggregate the sealed classes × domain result, and the
    * global table is sensitive-domain-sized and broadcast into a
    * classes × domain cross attach. Keep the sensitive domain bounded
    * (status codes, buckets — not free text): the audit compares
    * distributions, and a near-unique column has none worth
    * comparing.
    */
  def tClosenessClasses(df: DataFrame, qiCols: Seq[String],
                        sensitiveCol: String, tPpm: Long,
                        mat: Materializer = Materialize.Local): DataFrame = {
    require(qiCols.nonEmpty, "tClosenessClasses needs at least one QI column")
    require(tPpm >= 0L && tPpm < 1000000L,
      s"tPpm must be 0..999999, got $tPpm")
    val cv = mat(df.filter(col(sensitiveCol).isNotNull)
      .groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_n_cv")))
    tClosenessFromCv(cv, qiCols, sensitiveCol, tPpm)
  }

  /** Serve the release-level t-closeness audit from STORED partials —
    * and the partial is [[lDiversityPartials]]' asset VERBATIM: both
    * audits reduce to per-(segment, QI class, sensitive value) counts,
    * so ONE maintained table serves the diversity AND closeness
    * checks (sum-merge is exact by associativity; ValidateSpec holds
    * the any-segmentation property). Touches segments × classes ×
    * sensitive-domain rows, never the corpus.
    */
  def serveTCloseness(partials: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, tPpm: Long,
                      mat: Materializer = Materialize.Local): DataFrame = {
    require(qiCols.nonEmpty, "serveTCloseness needs at least one QI column")
    require(tPpm >= 0L && tPpm < 1000000L,
      s"tPpm must be 0..999999, got $tPpm")
    val cv = mat(partials.filter(col(sensitiveCol).isNotNull)
      .groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(sum(col("_n")).as("_n_cv")))
    tClosenessFromCv(cv, qiCols, sensitiveCol, tPpm)
  }

  /** Shared TVD core over the (QI, sensitive) count table: class
    * sizes and the global distribution re-aggregate `cv`; every class
    * is crossed with the broadcast global value table so absent
    * values count their global rate; exact-ppm rates and Σ|Δ| DIV 2.
    */
  private def tClosenessFromCv(cv: DataFrame, qiCols: Seq[String],
                               sensitiveCol: String,
                               tPpm: Long): DataFrame = {
    val cls = cv.groupBy(qiCols.map(col): _*)
      .agg(sum($"_n_cv").as("class_size"))
    val gv = cv.groupBy(col(sensitiveCol).as("_gs"))
      .agg(sum($"_n_cv").as("_n_v"))
      .withColumn("_n",
        sum($"_n_v").over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
    val qiEq = qiCols.map(q => col(s"c.$q") <=> col(s"v.$q"))
      .reduce(_ && _)
    cls.as("c").crossJoin(broadcast(gv).as("g"))
      .join(cv.as("v"),
        qiEq && col("g._gs") === col(s"v.$sensitiveCol"), "left")
      .select(qiCols.map(q => col(s"c.$q")) ++ Seq(
        col("c.class_size"), col("g._n_v"), col("g._n"),
        coalesce(col("v._n_cv"), lit(0L)).as("_n_cv")): _*)
      .withColumn("_d",
        abs(expr("_n_cv * 1000000 DIV class_size") -
          expr("_n_v * 1000000 DIV _n")))
      .groupBy((qiCols.map(col) :+ col("class_size")): _*)
      .agg(expr("sum(_d) DIV 2").as("tvd_ppm"))
      .filter($"tvd_ppm" > tPpm)
  }
}
