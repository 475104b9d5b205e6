package graft
package ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, language ID, quality scoring, document
  * fingerprinting. All are pure Column expressions (no UDFs) so they
  * stay inside whole-stage codegen and scale linearly with the corpus —
  * the per-document cost is independent of corpus size and there is no
  * shuffle in any of them.
  *
  * Reference analog: the ES `standard` analyzer + derived text fields
  * (SURVEY.md §2.8 Q6, scraper/main.py:275-276); generalized here per
  * the north star (BASELINE.json).
  */
object TextAnalysis {

  /** Whitespace tokens (deterministic, oracle-parity). */
  def toks(text: Column): Column = Fns.wsTokens(text)

  /** Word n-gram shingles over a token array. Empty when the document
    * has fewer than n tokens (guards Spark's descending `sequence`).
    */
  def shingles(toksCol: Column, n: Int): Column =
    when(size(toksCol) >= n,
      transform(sequence(lit(1), size(toksCol) - lit(n - 1)),
        i => concat_ws(" ", slice(toksCol, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(toks(text)).cast("long")

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, and single
    * non-space punctuation each count as one token (the shape of a GPT-2
    * style pre-tokenizer, without the merges table).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit(s"\\p{L}+|\\p{N}+|[^${Fns.wsClass}\\p{L}\\p{N}]"), lit(0)))
      .cast("long")

  // ------------------------------------------------------------ lang id
  /** Tiny per-language stopword lists for the n-gram/stopword heuristic.
    * Deliberately small and literal so the same lists inline into an SQL
    * oracle.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "nicht"),
    "es" -> Seq("el", "los", "las", "y", "un", "es", "que"),
    "zh" -> Seq("的", "是", "在", "了", "我"))

  /** Count of tokens that are stopwords of the given language. */
  def langScore(toksCol: Column, lang: String): Column = {
    val sw = array(stopwords.toMap.apply(lang).map(lit): _*)
    size(filter(toksCol, t => array_contains(sw, t))).cast("long")
  }

  /** Predicted language: argmax of stopword hits with a fixed tie-break
    * order (en, fr, de, es, zh), 'und' when no stopword hits at all.
    * The decision chain is written as first-match CASE WHEN so an SQL
    * oracle reproduces ties exactly.
    *
    * Composed form (each langScore is its own interpreted filter-HOF
    * pass, re-evaluated per reference); the scale path is
    * [[textStats]] + [[langIdFromStats]], property-tested equal.
    */
  def langId(toksCol: Column): Column = {
    val s = stopwords.map { case (l, _) => l -> langScore(toksCol, l) }.toMap
    langDecision(l => s(l))
  }

  /** The shared first-match decision chain over per-language hit counts. */
  private def langDecision(s: String => Column): Column = {
    val total = stopwords.map { case (l, _) => s(l) }.reduce(_ + _)
    when(total === 0, "und")
      .when(s("en") >= s("fr") && s("en") >= s("de") && s("en") >= s("es") && s("en") >= s("zh"), "en")
      .when(s("fr") >= s("de") && s("fr") >= s("es") && s("fr") >= s("zh"), "fr")
      .when(s("de") >= s("es") && s("de") >= s("zh"), "de")
      .when(s("es") >= s("zh"), "es")
      .otherwise("zh")
  }

  /** One-pass native token statistics struct: n_tokens, n_distinct,
    * sum_len (chars), hits = per-language stopword counts in
    * [[stopwords]] order. Materialize it as a column, then feed the
    * attribute to [[langIdFromStats]] / [[qualityScoreFromStats]] so
    * the (expensive) pass is computed once per row.
    */
  def textStats(toksCol: Column): Column =
    graft.plans.Native.textStats(toksCol, stopwords.map(_._2))

  /** [[langId]] over a materialized [[textStats]] `hits` array — same
    * decision chain, integer-identical counts.
    */
  def langIdFromStats(hits: Column): Column = {
    val idx = stopwords.map(_._1).zipWithIndex.toMap
    langDecision(l => element_at(hits, idx(l) + 1))
  }

  /** [[qualityScore]] over a materialized [[textStats]] struct — the
    * IDENTICAL IEEE expression tree over integer-identical counts, so
    * scores are bit-equal to the composed form (property-tested).
    */
  def qualityScoreFromStats(text: Column, st: Column): Column = {
    val nt = st.getField("n_tokens").cast("double")
    val nc = length(text).cast("double")
    val nDistinct = st.getField("n_distinct").cast("double")
    val sumLen = st.getField("sum_len").cast("double")
    val enIdx = stopwords.map(_._1).indexOf("en")
    val nStop = element_at(st.getField("hits"), enIdx + 1).cast("double")
    when(nt === 0.0, 0.0).otherwise(
      lit(0.25) * least(lit(1.0), nc / lit(400.0)) +
      lit(0.25) * (nDistinct / nt) +
      lit(0.25) * least(lit(1.0), (sumLen / nt) / lit(6.0)) +
      lit(0.25) * (lit(1.0) - abs(nStop / nt - lit(0.15))))
  }

  // ------------------------------------------------------- quality score
  /** Composite document quality in [0,1]: length, lexical diversity,
    * mean word length, stopword density. Every term derives from integer
    * counts through a fixed IEEE expression tree, so the double result
    * is bit-reproducible (and SQL-oracle-comparable).
    */
  def qualityScore(text: Column): Column = {
    val t = toks(text)
    val nt = size(t).cast("double")
    val nc = length(text).cast("double")
    val nDistinct = size(array_distinct(t)).cast("double")
    val sumLen = aggregate(t, lit(0), (acc, x) => acc + length(x)).cast("double")
    val enSw = array(stopwords.toMap.apply("en").map(lit): _*)
    val nStop = size(filter(t, x => array_contains(enSw, x))).cast("double")
    when(nt === 0.0, 0.0).otherwise(
      lit(0.25) * least(lit(1.0), nc / lit(400.0)) +
      lit(0.25) * (nDistinct / nt) +
      lit(0.25) * least(lit(1.0), (sumLen / nt) / lit(6.0)) +
      lit(0.25) * (lit(1.0) - abs(nStop / nt - lit(0.15))))
  }

  // ------------------------------------------------------- fingerprinting
  /** Content fingerprint: minimum md5 over word 5-gram shingles (the
    * min-hash / winnowing family — Schleimer et al., "Winnowing: Local
    * Algorithms for Document Fingerprinting", SIGMOD'03). Documents
    * sharing any region of >= 5 words are likely to collide; md5 of the
    * whole text is the fallback for very short documents.
    */
  def fingerprint(text: Column): Column =
    // Native one-pass form of when(size(sh) > 0, array_min(transform(
    // sh, md5))).otherwise(md5(text)): min over DISTINCT shingles
    // equals min over all (min is idempotent), minMd5 is null on empty
    // so coalesce supplies the short-doc fallback. Measured 5.4s ->
    // sub-second over sf0.1 docs (PROFILE.md).
    coalesce(
      graft.plans.Native.minMd5(
        graft.plans.Native.distinctShingles(toks(text), 5)),
      md5(text))

  // ---------------------------------------------------------- PII scrub
  /** PII patterns, deliberately limited to regex syntax shared by
    * Java's engine and RE2 (character classes + bounded quantifiers,
    * no lookaround/backrefs) so the SQL oracle runs the same patterns.
    */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pat = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val longNumPat = "[0-9]{7,}"

  /** PII redaction for corpus cleaning: emails, IPv4 addresses, then
    * long digit runs, replaced IN THAT ORDER (an IP's octets or an
    * email's digits must not be double-counted as numbers). Pure
    * regexp_replace chain — codegen, shuffle-free, linear. Count the
    * matches per stage with `size(regexp_extract_all(...))` on that
    * stage's INPUT (see q63 for the staged form).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPat, "<EMAIL>"),
        ipv4Pat, "<IP>"),
      longNumPat, "<NUM>")

  // ---------------------------------------------- URL canonicalization
  /** URL canonicalization for crawl dedup — the normalizer that sits
    * in front of first-occurrence URL dedup (D1): two spellings of
    * one resource must collapse to one key BEFORE hashing, or the
    * dedup silently keeps both. Steps (documented, deterministic,
    * regex syntax limited to the Java∩RE2 subset like the PII
    * patterns so the oracle runs the same expressions):
    *   1. strip the fragment (`#...` — never sent to the server);
    *   2. drop tracking parameters (utm_*, gclid, fbclid), keeping
    *      the separator so later params survive;
    *   3. collapse separator runs (`?&` → `?`, `&&` → `&`) and drop a
    *      trailing `?`/`&`;
    *   4. lowercase the scheme and HOST only — userinfo (user:pass@),
    *      paths and query values are case-sensitive per RFC 3986 and
    *      left alone.
    * Pure regexp chain — codegen, shuffle-free, linear.
    */
  val trackingParamPat = "([?&])(?:utm_[a-zA-Z]+|gclid|fbclid)=[^&#]*"
  val schemeHostPat = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
  /** The scheme://authority prefix split into (scheme://, userinfo@,
    * host): userinfo is case-SENSITIVE per RFC 3986 §3.2.1 and must
    * survive canonicalization unchanged — only scheme and host are
    * case-insensitive. The userinfo group is greedy, so a (formally
    * illegal) '@' inside userinfo still leaves the host = the part
    * after the LAST '@', which is the only RFC-consistent reading.
    */
  val schemeUiHostPat = "^([a-zA-Z][a-zA-Z0-9+.-]*://)([^/?#]*@)?([^/?#]*)"

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val noTrack = regexp_replace(noFrag, trackingParamPat, "$1")
    val collapsed = regexp_replace(
      regexp_replace(
        regexp_replace(noTrack, "\\?&+", "?"),
        "&&+", "&"),
      "[?&]+$", "")
    val scheme = regexp_extract(collapsed, schemeUiHostPat, 1)
    val ui = regexp_extract(collapsed, schemeUiHostPat, 2)
    val host = regexp_extract(collapsed, schemeUiHostPat, 3)
    when(scheme === "", collapsed)
      .otherwise(concat(lower(scheme), ui, lower(host),
        regexp_replace(collapsed, schemeHostPat, "")))
  }

  /** Repeated n-gram fraction — the C4/Gopher-family repetition signal
    * (boilerplate and looping text score high): 1 - distinct/total
    * word n-grams, 0.0 for docs shorter than n tokens. Total count is
    * pure arithmetic on the token count (the shingle list itself is
    * never materialized); the distinct count reuses the native
    * one-pass shingle expression. Exact integer counts into one IEEE
    * division — engine-portable.
    */
  def repetitionScore(text: Column, n: Int): Column = {
    val t = toks(text)
    val total = greatest(size(t) - (n - 1), lit(0))
    val distinct = size(graft.plans.Native.distinctShingles(t, n))
    when(total > 0,
      lit(1.0) - distinct.cast("double") / total.cast("double"))
      .otherwise(0.0)
  }

  /** Duplicate-segment stats over one segment list (lines or
    * paragraphs): a duplicate is any occurrence of a segment BEYOND
    * its first (the Gopher convention, Rae et al. 2021 §A1.1 —
    * `dup_n = n - n_distinct`), and duplicate characters are the
    * characters of exactly those repeat occurrences
    * (`total_chars - chars-of-one-copy-each`, order-free because only
    * lengths are summed). Exact integer counts throughout.
    */
  private def dupSegStats(segs: Column): Column = {
    val d = array_distinct(segs)
    val totalChars = aggregate(segs, lit(0L), (acc, x) => acc + length(x))
    val distinctChars = aggregate(d, lit(0L), (acc, x) => acc + length(x))
    struct(
      size(segs).cast("long").as("n"),
      (size(segs) - size(d)).cast("long").as("dup_n"),
      totalChars.as("total_chars"),
      (totalChars - distinctChars).as("dup_chars"))
  }

  /** Gopher-family repetition quality signals (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", §A1.1 repetition filters),
    * the structural complement of the n-gram [[repetitionScore]]:
    * boilerplate-heavy pages repeat whole LINES (nav bars, cookie
    * banners) and whole PARAGRAPHS (templated articles), which word
    * n-gram fractions under-detect when the repeats are long.
    *
    * Pinned semantics (engine-portable, oracle-replayable):
    *  - lines split on the literal `\n`, paragraphs on the literal
    *    `\n\n`; empty segments (separator runs / edges) are dropped
    *    BEFORE counting;
    *  - `dup_*_ppm` = duplicate occurrences per million segments
    *    (count·10⁶ DIV n, exact integer);
    *  - `dup_*_char_ppm` = characters inside those repeat occurrences
    *    per million segment characters.
    * A doc with no segments (empty text) reports 0 across the board.
    *
    * Scale shape: pure Column expression over each document — no
    * shuffle, no UDF, per-doc cost bounded by the doc itself; at
    * 100 TB this rides the same single corpus scan as the other
    * quality columns (see q192).
    */
  def repetitionStats(text: Column): Column = {
    def nonEmpty(c: Column): Column = filter(c, x => x =!= "")
    val lines = nonEmpty(split(text, "\n"))
    val paras = nonEmpty(split(text, "\n\n"))
    val ls = dupSegStats(lines)
    val ps = dupSegStats(paras)
    def ppm(num: Column, den: Column): Column =
      when(den > 0, expr_ppm(num, den)).otherwise(0L)
    struct(
      ls.getField("n").as("n_lines"),
      ppm(ls.getField("dup_n"), ls.getField("n")).as("dup_line_ppm"),
      ppm(ls.getField("dup_chars"), ls.getField("total_chars"))
        .as("dup_line_char_ppm"),
      ps.getField("n").as("n_paras"),
      ppm(ps.getField("dup_n"), ps.getField("n")).as("dup_para_ppm"),
      ppm(ps.getField("dup_chars"), ps.getField("total_chars"))
        .as("dup_para_char_ppm"))
  }

  /** Exact integer ppm ([[graft.functions.Fns.exactPpm]] — the shared
    * remainder-subtraction fixed-point helper, exact ≤ 2^53).
    */
  private def expr_ppm(num: Column, den: Column): Column =
    Fns.exactPpm(num, den)

  // -------------------------------------------------------- collocations
  /** Collocation extraction: adjacent-token bigrams ranked by the
    * pointwise association ratio p(ab) / (p(a)·p(b)) — the PMI
    * argument without the final log, so the score is a single
    * correctly-rounded IEEE division of exact integer counts
    * (cross-engine-deterministic, unlike ln whose last-ulp behavior is
    * libm-specific; log is monotone, so the RANKING is PMI's).
    *
    * Scale shape: two linear explode+count aggregations (bigrams,
    * tokens) with map-side combine, two equi-joins keyed on the token
    * to attach unigram counts, TakeOrderedAndProject for the top-k.
    * The minCount filter prunes the long tail BEFORE the joins.
    */
  def collocations(docs: org.apache.spark.sql.DataFrame, textCol: String,
                   minCount: Long, topK: Int): org.apache.spark.sql.DataFrame = {
    val t = toks(col(textCol))
    // adjacent pairs via one zip against the tail (linear; the generic
    // shingles HOF re-slices per element): the zip pads the shorter
    // tail with null, concat propagates it, filter drops it
    val adjacent = filter(
      zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)
    val bigrams = docs.select(explode(adjacent).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt_ab"))
      .filter(col("cnt_ab") >= minCount)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
    val unigrams = docs.select(explode(t).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val totals = broadcast(docs.agg(
      sum(size(t)).cast("double").as("n_tok"),
      sum(greatest(size(t) - 1, lit(0))).cast("double").as("n_bg")))
    bigrams
      .join(unigrams.select(col("w").as("w1"), col("cnt").as("cnt_a")), Seq("w1"))
      .join(unigrams.select(col("w").as("w2"), col("cnt").as("cnt_b")), Seq("w2"))
      .crossJoin(totals)
      .select(col("bg").as("bigram"), col("cnt_ab"),
        ((col("cnt_ab").cast("double") * col("n_tok") * col("n_tok")) /
          (col("n_bg") * col("cnt_a").cast("double") * col("cnt_b").cast("double")))
          .as("assoc"))
      .orderBy(col("assoc").desc, col("bigram").asc)
      .limit(topK)
  }

  // ------------------------------------------------------------- simhash
  private val hexDigits = "0123456789abcdef"

  /** SimHash (Charikar, STOC'02) of the token multiset, returned as a
    * `bits`-char '0'/'1' string (portable across engines — no 64-bit
    * unsigned juggling). Bit j is derived from nibble j/4, bit j%4 of
    * each token's md5; the per-token ±1 votes are summed exactly in
    * integers. `mdCol` must be a materialized array of per-token md5
    * hex strings (computed once per document).
    *
    * Scale note: at >=1e8 documents a 32-bit fingerprint cannot
    * separate the corpus (band keys get too short and candidate joins
    * go quadratic) — use 64 bits (the default in [[Dedup.simhashPairs]]).
    * md5 has 128 bits = 32 nibbles, so bits <= 128.
    */
  def simhash(mdCol: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 128, s"simhash bits must be 1..128, got $bits")
    val bitChars = (0 until bits).map { j =>
      val nibblePos = j / 4 + 1
      val bitDiv = 1 << (j % 4)
      val vote = aggregate(mdCol, lit(0), (acc, m) => {
        val v = instr(lit(hexDigits), substring(m, nibblePos, 1)) - 1
        val bit = (v.cast("int") / lit(bitDiv)).cast("int") % 2
        acc + (bit * 2 - 1)
      })
      when(vote > 0, "1").otherwise("0")
    }
    concat(bitChars: _*)
  }

  /** 64-bit SimHash — the scale default. Native single-pass expression;
    * output is identical to `simhash(mdCol, 64)` (the composed form
    * above, kept as the executable spec — equivalence is property-
    * tested in TextAnalysisSpec), but the composed form walks the
    * interpreter per token PER BIT and dominated q24's runtime.
    */
  def simhash64(mdCol: Column): Column =
    graft.plans.Native.simhash(mdCol, 64)

  /** Hamming distance between two equal-length '0'/'1' fingerprint
    * strings, as a codegen-friendly expression.
    */
  def hamming(a: Column, b: Column, bits: Int): Column =
    size(filter(zip_with(split(a, ""), split(b, ""),
      (x, y) => x =!= y), p => p)).cast("long")

  /** Adjacent character-pair statistics — the counting step a BPE
    * tokenizer trainer runs every merge round (Sennrich et al. 2016):
    * within each whitespace word, every adjacent character bigram,
    * counted across the corpus, floored at `minCount`, top-k by
    * (count desc, pair asc). One explode + one map-side-combined
    * aggregate + TakeOrderedAndProject — the corpus-sized shuffle is
    * the pair count only. (The full iterative merge loop is a
    * DRIVER-side training procedure over these statistics — each
    * round is this operator over the re-segmented corpus; the
    * per-round statistic is the distributed part.)
    * Output: (pair, n).
    */
  def bpePairStats(docs: org.apache.spark.sql.DataFrame, textCol: String,
                   minCount: Long, k: Int): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1L && k >= 1, s"bad params: $minCount, $k")
    docs.select(explode(toks(col(textCol))).as("w"))
      .filter(char_length(col("w")) >= 2)
      // 1-char words are filtered above, so the sequence is ascending
      .select(explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substr(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)
  }

  // ------------------------------------------------------------ bpe train

  /** Symbol separator for the BPE sequence encoding: each symbol is
    * wrapped INDIVIDUALLY — the word "abc" is held as `␟a␟␟b␟␟c␟` —
    * so one merge round is ONE non-overlapping left-to-right string
    * `replace` of `␟l␟␟r␟` with `␟lr␟`, semantics Spark's
    * StringReplace, DuckDB's replace and greedy BPE merging share
    * exactly. The per-symbol wrapping matters: with single SHARED
    * separators (`␟a␟a␟a␟a␟`) a match consumes the separator the
    * next occurrence needs to start, so "aaaa" merged only once
    * instead of twice (caught by the property test vs the reference
    * trainer); wrapped symbols share no boundary characters, so
    * consecutive occurrences all merge — `␟a␟␟a␟␟a␟␟a␟` →
    * `␟aa␟␟aa␟` — and the left-greedy overlap rule falls out
    * (`aaa` → [aa, a]). U+001F (unit separator) — words containing
    * it are dropped at intake (the documented contract; it does not
    * occur in natural text).
    */
  private[ops] val BpeSep = "\u001f"

  private def seqSymbols(seqCol: Column): Column =
    filter(split(seqCol, BpeSep), x => x =!= "")

  // DOTALL: Java's plain '.' excludes \r, U+0085, U+2028, U+2029 —
  // characters wsTokens does NOT strip (its class is the reference
  // Python str.split set minus what RE2 adds). An unwrapped char in
  // the seq encoding would make the merge replace (which expects
  // double-separator boundaries) silently never match, turning that
  // pair into a repeated no-op merge round — and diverging from the
  // DuckDB oracle, whose RE2 '.' does match U+2028/U+2029 (ADVICE
  // r11). With (?s) every char wraps; tokens cannot contain \n (the
  // only char RE2's '.' skips) after wsTokens, so both engines wrap
  // the identical character set.
  private def wordToSeq(w: Column): Column =
    regexp_replace(w, "(?s)(.)", BpeSep + "$1" + BpeSep)

  /** TRAIN a byte-pair-encoding merge table (Sennrich et al. 2016,
    * "Neural Machine Translation of Rare Words with Subword Units") —
    * the full iterative merge loop, not just one round of statistics
    * ([[bpePairStats]]): count adjacent symbol pairs, merge the most
    * frequent pair everywhere, repeat `nMerges` times. The trained
    * artifact is the ordered merge list (rank, lft, rgt, merged, n) —
    * what a tokenizer ships.
    *
    * Determinism: the merge choice is (count desc, lft asc, rgt asc)
    * — binary string order — so the entire merge SEQUENCE replays
    * exactly in any engine (ties in pair counts are common in real
    * corpora; an unpinned tie order would fork the whole training
    * trajectory, not one row).
    *
    * Scale shape — the reason this trains at 100 TB: the corpus is
    * touched ONCE (the word-type frequency aggregate, map-side
    * combined); every round after that operates on the word-TYPE
    * table, which Zipf bounds at vocabulary size ≪ corpus size. Per
    * round: one pair aggregate over types (weighted by type
    * frequency), one driver-side top-1 (a single collected row — the
    * loop-control pattern of [[Dedup.duplicateClusters]]), one
    * map-only string replace, sealed per round ([[Materializer]]
    * lazy-checkpoint — round k's plan never nests round k−1's).
    * Reference trainers (e.g. HuggingFace) instead keep incremental
    * pair-count deltas in mutable per-word state — cheaper serially,
    * but the recount-over-types form is what parallelizes without
    * shared state; its cost is stated: nMerges × one pass over the
    * type table. No end-of-word marker (matches [[bpePairStats]]'s
    * plain within-word convention; callers wanting `</w>` append it
    * to `textCol` upstream).
    *
    * Stops early when no pair remains (fully merged corpus); the
    * result then has fewer than `nMerges` rows.
    */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
               nMerges: Int,
               mat: Materializer = Materialize.LocalLazy): org.apache.spark.sql.DataFrame = {
    require(nMerges >= 1 && nMerges <= 200,
      s"nMerges must be 1..200, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONLY corpus-sized pass: word-type frequencies (1-char words
    // can never pair; separator-bearing words are out of contract)
    var words = mat(docs.select(explode(toks(col(textCol))).as("w"))
      .filter(char_length(col("w")) >= 2 &&
        !col("w").contains(lit(BpeSep)))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(wordToSeq(col("w")).as("seq"), col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val top = words
        .select(seqSymbols(col("seq")).as("s"), col("freq"))
        .filter(size(col("s")) >= 2) // merged-to-one-symbol words pair no more
        .select(explode(transform(sequence(lit(1), size(col("s")) - 1),
          i => struct(element_at(col("s"), i).as("lft"),
            element_at(col("s"), i + 1).as("rgt")))).as("p"), col("freq"))
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("lft").asc, col("rgt").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, rt, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r + 1L, l, rt, n))
        words = mat.iterative(words.withColumn("seq",
          replace(col("seq"),
            lit(BpeSep + l + BpeSep + BpeSep + rt + BpeSep),
            lit(BpeSep + l + rt + BpeSep))))
        r += 1
      }
    }
    merges.toSeq.toDF("rank", "lft", "rgt", "n")
      .select(col("rank"), col("lft"), col("rgt"),
        concat(col("lft"), col("rgt")).as("merged"), col("n"))
  }

  /** SEGMENT documents with a trained merge table ([[bpeTrain]]): each
    * word replays the merges in rank order (the standard apply-time
    * rule — training order, not corpus statistics, decides), then the
    * per-word symbol runs are reassembled in document order. The
    * merge list is collected driver-side (bounded: `nMerges` rows)
    * and folded into the plan as a chain of literal replaces — a
    * single map-only projection, no join, no shuffle beyond the
    * doc_id reassembly (the [[encodeDocs]] shape). Words outside the
    * training contract (1-char, separator-bearing) pass through as
    * single symbols. Output: (doc_id, syms array&lt;string&gt;).
    *
    * `native = true` swaps the per-word replace chain for the fused
    * [[graft.plans.Native.bpeMerge]] expression — one symbol-array
    * scan per merge rank instead of `nMerges` separator-wrapped
    * string rebuilds per token occurrence. Same output by contract:
    * NativeSpec property-tests word-level equality, and q199 runs
    * this path under q178's unchanged DuckDB oracle.
    */
  def bpeSegment(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String,
                 merges: org.apache.spark.sql.DataFrame,
                 native: Boolean = false): org.apache.spark.sql.DataFrame = {
    val ms = merges.orderBy(col("rank"))
      .select(col("lft"), col("rgt")).collect()
      .map(row => (row.getString(0), row.getString(1)))
    val wordSyms =
      if (native) graft.plans.Native.bpeMerge(col("word"), ms.toSeq)
      else {
        val applied = ms.foldLeft(wordToSeq(col("word"))) { case (c, (l, rt)) =>
          replace(c, lit(BpeSep + l + BpeSep + BpeSep + rt + BpeSep),
            lit(BpeSep + l + rt + BpeSep))
        }
        when(char_length(col("word")) < 2 ||
          col("word").contains(lit(BpeSep)), array(col("word")))
          .otherwise(seqSymbols(applied))
      }
    val pos = docs.select(col(idCol).as("doc_id"),
        posexplode(toks(col(textCol))).as(Seq("pos", "word")))
      .withColumn("wsyms", wordSyms)
    val asm = pos.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(
        struct(col("pos"), col("wsyms")))).as("_s"))
      .select(col("doc_id"),
        flatten(transform(col("_s"), s => s.getField("wsyms"))).as("syms"))
    docs.select(col(idCol).as("doc_id")).join(asm, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("syms"), array().cast("array<string>")).as("syms"))
  }

  // ------------------------------------------------------------ drift

  /** Token-distribution drift between two corpus slices — the
    * train/validation (or yesterday/today) shift monitor every
    * ingestion pipeline wants: per-token occurrence RATES in exact
    * integer ppm (count·10⁶ DIV slice-total), ranked by absolute rate
    * difference. `minCount` floors the combined count so the long tail
    * (rate estimates with huge variance) never dominates the report;
    * top-k keeps the report bounded. Every step is int64 — rates,
    * drift, and the (drift desc, token asc) order replay exactly, so
    * the report is oracle-checkable (a chi-square/G-test ranking
    * would square occurrence×corpus products past int64 and pull
    * float logs into the gate).
    *
    * Scale shape: one token-count aggregate per slice (map-side
    * combined, the only corpus-sized shuffles), totals attached as
    * broadcast 1-row aggregates, full-outer join on the (bounded)
    * surviving vocabulary, TakeOrderedAndProject for the top-k.
    * Output: (token, n_a, n_b, rate_a_ppm, rate_b_ppm, drift_ppm).
    */
  def tokenDrift(a: org.apache.spark.sql.DataFrame,
                 b: org.apache.spark.sql.DataFrame, textCol: String,
                 minCount: Long, k: Int,
                 mat: Materializer = Materialize.LocalLazy): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    // count tables sealed once: each feeds its own total aggregate
    // AND the full-outer join (one tokenize pass per slice)
    def counts(df: org.apache.spark.sql.DataFrame, side: String) =
      mat(df.select(explode(toks(col(textCol))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as(s"n_$side")))
    val (ca, cb) = (counts(a, "a"), counts(b, "b"))
    val totA = broadcast(ca.agg(sum(col("n_a")).as("tot_a")))
    val totB = broadcast(cb.agg(sum(col("n_b")).as("tot_b")))
    ca.join(cb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .filter(col("n_a") + col("n_b") >= minCount)
      .crossJoin(totA).crossJoin(totB)
      .select(col("token"), col("n_a"), col("n_b"),
        expr("n_a * 1000000 DIV tot_a").as("rate_a_ppm"),
        expr("n_b * 1000000 DIV tot_b").as("rate_b_ppm"))
      .withColumn("drift_ppm",
        abs(col("rate_a_ppm") - col("rate_b_ppm")))
      .orderBy(col("drift_ppm").desc, col("token").asc)
      .limit(k)
  }

  // ------------------------------------------------------------ vocab

  /** Frequency-ranked vocabulary over the corpus: (token, id, n) for
    * every token with count >= minCount, id = 1-based rank by
    * (count desc, token asc) — the deterministic convention every
    * tokenizer-training pipeline uses (id 0 is reserved for OOV, see
    * [[encodeDocs]]).
    *
    * Scale shape — the global rank WITHOUT a global sort: a
    * single-task row_number over millions of vocab rows would be the
    * q87 anti-pattern, so the rank is split two-phase on the q149
    * histogram protocol: (1) row_number PARTITIONED by count, ordered
    * by token — parallel across count values; (2) each token's offset
    * = total tokens with a strictly HIGHER count, a cumulative window
    * over the count-of-counts histogram, which Zipf keeps tiny
    * (distinct COUNTS ≪ distinct tokens: the long tail collapses
    * into n=1,2,3…). rank = offset + within-rank. The only
    * corpus-sized shuffle is the token count itself (map-side
    * combined).
    */
  def buildVocab(docs: org.apache.spark.sql.DataFrame, textCol: String,
                 minCount: Long): org.apache.spark.sql.DataFrame =
    buildVocabFromTokens(
      docs.select(explode(toks(col(textCol))).as("token")), minCount)

  /** [[buildVocab]] over an already-tokenized stream (one `token`
    * column) — the seam that lets a TRAINED subword segmentation
    * ([[bpeSegment]]) feed the same two-phase rank (q184: symbol
    * vocabularies), instead of hard-wiring the whitespace tokenizer.
    * Same contract and plan shape; see [[buildVocab]].
    */
  def buildVocabFromTokens(tokens: org.apache.spark.sql.DataFrame,
                           minCount: Long): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    import org.apache.spark.sql.expressions.Window
    val tc = tokens.select(col("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    val within = Window.partitionBy(col("n")).orderBy(col("token"))
    val ranked = tc.withColumn("_r", row_number().over(within).cast("long"))
    val counts = tc.groupBy(col("n")).agg(count(lit(1)).as("_cnt"))
    // bounded: one row per DISTINCT count value
    val wOff = Window.orderBy(col("n").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.withColumn("_off",
      coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
    ranked.join(broadcast(offs.select(col("n"), col("_off"))), Seq("n"))
      .select(col("token"), (col("_off") + col("_r")).as("id"), col("n"))
  }

  /** Encode every document as its vocabulary-id sequence: tokens are
    * looked up in `vocab` ([[buildVocab]]'s (token, id) — broadcast:
    * even a 10M-entry vocab is ~100 MB, far under a corpus shuffle),
    * OOV tokens map to id 0, and order is restored by token position
    * (the span-dedup explode/reassemble shape — one shuffle on
    * doc_id). Documents with zero tokens keep an empty sequence.
    * Output: (doc_id, ids array&lt;long&gt;).
    */
  def encodeDocs(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String,
                 vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    encodeSeqs(docs.select(col(idCol), toks(col(textCol)).as("_toks")),
      idCol, "_toks", vocab)

  /** [[encodeDocs]] over an already-tokenized sequence column (an
    * array&lt;string&gt; per document) — the other half of the q184
    * seam: a [[bpeSegment]] symbol run encodes through the identical
    * broadcast-lookup/reassembly plan. Same contract; see
    * [[encodeDocs]].
    */
  def encodeSeqs(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 seqCol: String,
                 vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pos = docs.select(col(idCol).as("doc_id"),
        posexplode(col(seqCol)).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("id"))),
        Seq("token"), "left")
    val enc = pos.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(
        struct(col("pos"), coalesce(col("id"), lit(0L)).as("id")))).as("_s"))
      .select(col("doc_id"),
        transform(col("_s"), s => s.getField("id")).as("ids"))
    docs.select(col(idCol).as("doc_id")).join(enc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ids"), array().cast("array<bigint>")).as("ids"))
  }

  /** Pinned out-of-vocabulary sentinel of [[decodeIds]] — whitespace-
    * free so space-joined fingerprints stay collision-unambiguous.
    */
  val UnkToken = "<unk>"

  /** Decode id sequences back to token runs — [[encodeSeqs]]'s inverse
    * on in-vocabulary tokens (OOV id 0 decodes to [[UnkToken]]; vocab
    * ids start at 1, so the sentinel id cannot collide). The
    * inspection/serving half of the tokenizer story: debugging a
    * training batch, detokenizing model output, spot-checking an
    * encoded corpus — all read THROUGH this path, so it is gated
    * (q208) rather than left as a test helper. Same plan shape as the
    * encode: broadcast vocab lookup on the posexploded ids, per-doc
    * reassembly in position order (the one shuffle), empty/absent
    * sequences decode to empty runs.
    */
  def decodeIds(encoded: org.apache.spark.sql.DataFrame,
                vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pos = encoded.select(col("doc_id"),
        posexplode(col("ids")).as(Seq("pos", "id")))
      .join(broadcast(vocab.select(col("id"), col("token"))),
        Seq("id"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("token"), lit(UnkToken)).as("token"))
    val asm = pos.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(
        struct(col("pos"), col("token")))).as("_s"))
      .select(col("doc_id"),
        transform(col("_s"), s => s.getField("token")).as("toks"))
    encoded.select(col("doc_id")).join(asm, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("toks"), array().cast("array<string>")).as("toks"))
  }

  // ------------------------------- distribution-matching selection

  /** md5 bucket of a token — `conv` of the first 8 md5 hex chars mod
    * nBuckets ([[Sessions.ppmBucket]]'s hash with a caller-sized
    * modulus), the feature hashing every bucket-rate/score operator
    * below shares. Exact int64; replays in any engine from the hex.
    */
  private def tokBucket(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % nBuckets

  /** Hashed-unigram bucket rates of a corpus — the distribution asset
    * of distribution-matching selection: every token hashes to one of
    * `nBuckets` buckets and the bucket's rate is its exact-ppm share
    * of the corpus's total token count (count·10⁶ DIV total, the
    * drift-tier quantization). Returns (bucket, n, rate_ppm); buckets
    * no token hit are absent (treat as rate 0 downstream).
    *
    * Scale shape: one corpus explode into one grouped count (map-side
    * combined, nBuckets-bounded output) — the asset is tiny and
    * broadcastable however large the corpus.
    */
  def bucketRates(docs: org.apache.spark.sql.DataFrame, textCol: String,
                  nBuckets: Int): org.apache.spark.sql.DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000000,
      s"nBuckets must be 2..1000000, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    docs.select(explode(toks(col(textCol))).as("tok"))
      .select(tokBucket(col("tok"), nBuckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .withColumn("_tot", sum(col("n")).over(Window.partitionBy()))
      .withColumn("rate_ppm", expr("n * 1000000 DIV _tot"))
      .drop("_tot")
  }

  /** The STORED partial of [[bucketRates]] — the q210/q212 maintenance
    * axis applied to the distribution asset: per (`segmentCol`,
    * bucket) token counts, one corpus pass per ingest segment,
    * nBuckets-bounded output per segment. Counts are plain sums, so
    * [[bucketRatesFromPartials]]' merge is exact by associativity —
    * at 100 TB the weight table refreshes from delta-sized partials
    * instead of re-exploding the corpus.
    */
  def bucketCountPartials(docs: org.apache.spark.sql.DataFrame,
                          segmentCol: String, textCol: String,
                          nBuckets: Int): org.apache.spark.sql.DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000000,
      s"nBuckets must be 2..1000000, got $nBuckets")
    docs.select(col(segmentCol).as("_seg"),
        explode(toks(col(textCol))).as("tok"))
      .select(col("_seg"), tokBucket(col("tok"), nBuckets).as("bucket"))
      .groupBy(col("_seg"), col("bucket"))
      .agg(count(lit(1)).as("_n"))
  }

  /** Serve [[bucketRates]] from stored partials: sum-merge per bucket,
    * re-derive the exact-ppm rates — equal to the one-shot pass by
    * sum associativity (TextAnalysisSpec property; the gate runs it
    * under q224's oracle verbatim). Touches segments × buckets rows,
    * never the corpus.
    */
  def bucketRatesFromPartials(partials: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    partials.groupBy(col("bucket")).agg(sum(col("_n")).as("n"))
      .withColumn("_tot", sum(col("n")).over(Window.partitionBy()))
      .withColumn("rate_ppm", expr("n * 1000000 DIV _tot"))
      .drop("_tot")
  }

  /** Per-document hashed-bucket linear score — the inference core of
    * the fastText-style hashed linear classifier (external weight
    * table) and of [[distributionMatchScore]] (rate-difference
    * weights): score_ppm(doc) = Σ_tok w(bucket(tok)) DIV n_toks, the
    * TRUNCATE-toward-zero integer mean of the per-token weights —
    * sums can be NEGATIVE, and truncation is pinned deliberately:
    * Spark's DIV and DuckDB's // both truncate (verified, −7÷2 = −3
    * in both), so the quantization replays verbatim. Buckets absent
    * from `weights` score 0. Token-less documents are ABSENT from the
    * output (no distribution to score — the t-closeness discipline);
    * weights must be int64 ppm-scale values (|w| ≤ 10⁶ keeps every
    * per-doc sum under 2⁶³ for documents up to ~9e12 tokens).
    *
    * Scale shape: one corpus explode, a BROADCAST weight join
    * (nBuckets-bounded), ONE doc-key aggregate — the only shuffle.
    */
  def scoreByBucketWeights(docs: org.apache.spark.sql.DataFrame,
                           idCol: String, textCol: String,
                           weights: org.apache.spark.sql.DataFrame,
                           nBuckets: Int): org.apache.spark.sql.DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000000,
      s"nBuckets must be 2..1000000, got $nBuckets")
    docs.select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("tok"))
      .withColumn("bucket", tokBucket(col("tok"), nBuckets))
      .join(broadcast(weights.select(col("bucket"), col("w"))),
        Seq("bucket"), "left")
      .na.fill(0L, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("_sw"))
      .withColumn("score_ppm", expr("_sw DIV n_toks"))
      .drop("_sw")
  }

  /** Distribution-matching selection score — the DSIR selection shape
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023: rank raw documents by how much more
    * their hashed-unigram features look like a TARGET corpus than the
    * raw corpus average) with the per-token log-likelihood ratio
    * replaced by the exact-integer ppm RATE DIFFERENCE, so the score
    * is engine-portable and the oracle replays it bit-for-bit (the
    * same no-libm trade [[Stats.distributionDrift]] makes against
    * PSI). score_ppm &gt; 0 = the document leans on vocabulary the
    * target over-represents; select by threshold or top-k.
    *
    * Scale shape: two bucket-rate passes (target + raw — each one
    * explode into an nBuckets-bounded count) build a broadcast weight
    * table; scoring is [[scoreByBucketWeights]]' single-shuffle pass.
    */
  def distributionMatchScore(docs: org.apache.spark.sql.DataFrame,
                             idCol: String, textCol: String,
                             target: org.apache.spark.sql.DataFrame,
                             targetTextCol: String,
                             nBuckets: Int): org.apache.spark.sql.DataFrame =
    scoreByBucketWeights(docs, idCol, textCol,
      rateDiffWeights(bucketRates(target, targetTextCol, nBuckets),
        bucketRates(docs, textCol, nBuckets)), nBuckets)

  /** The (bucket, w = target rate − raw rate) weight table of
    * [[distributionMatchScore]], exposed so maintained rate assets
    * ([[bucketRatesFromPartials]]) plug in without re-exploding
    * either corpus. Buckets absent from one side take rate 0.
    */
  def rateDiffWeights(targetRates: org.apache.spark.sql.DataFrame,
                      rawRates: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val rt = targetRates.select(col("bucket"), col("rate_ppm").as("_rt"))
    val rr = rawRates.select(col("bucket"), col("rate_ppm").as("_rr"))
    rt.join(rr, Seq("bucket"), "full")
      .na.fill(0L, Seq("_rt", "_rr"))
      .select(col("bucket"), (col("_rt") - col("_rr")).as("w"))
  }
}
