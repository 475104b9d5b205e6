package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic-aggregation and text helpers shared by all operators.
  *
  * Double-precision summation is not associative, so a distributed sum over
  * doubles depends on partition/run order and cannot be hash-compared
  * against an external oracle (or against a re-run of the same job on a
  * different cluster layout). All money/measure aggregates therefore run
  * through exact DECIMAL(18,4) arithmetic and only the FINAL scalar is cast
  * back to double. This is also the right call at 100 TB: decimal partial
  * aggregates are order-independent, so AQE/skew re-planning can never
  * change the answer.
  */
object Fns {
  val D: DecimalType = DecimalType(18, 4)

  def dec(c: Column): Column = c.cast(D)

  val oneD: Column = lit(1).cast(D)

  /** Correctly-rounded decimal -> double, via the string form: a direct
    * decimal(38,_)->double cast double-rounds in engines that convert
    * int128 storage to double BEFORE dividing by the scale (DuckDB
    * does; observed 3-ulp drift on wide sums). decimal->string is
    * exact and string->double is correctly rounded everywhere, so this
    * path yields the nearest double of the exact rational in every
    * engine. Only applied to (tiny) aggregated values.
    */
  def decDouble(c: Column): Column = c.cast("string").cast("double")

  /** Order-independent SUM of a double column (exact decimal internally). */
  def dsum(c: Column): Column = decDouble(sum(c.cast(D)))

  /** Exact sum of an already-decimal expression, returned as double. */
  def dsumExpr(e: Column): Column = decDouble(sum(e))

  /** Order-independent AVG: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column = decDouble(sum(c.cast(D))) / count(c)

  /** Deterministic sample variance from EXACT decimal moments:
    * (Σx² - (Σx)²/n) / (n-1), with both sums accumulated in decimal
    * and the arithmetic shape fixed — unlike Welford-style built-in
    * var_samp, the result is independent of partition order and
    * reproducible in any engine that can sum decimals.
    */
  def dvar(c: Column): Column = {
    val n = count(c).cast("double")
    val s = decDouble(sum(dec(c)))
    val s2 = decDouble(sum(dec(c) * dec(c)))
    (s2 - s * s / n) / (n - lit(1.0))
  }

  /** Deterministic sample stddev (sqrt of [[dvar]]). */
  def dstd(c: Column): Column = sqrt(dvar(c))

  /** Deterministic Pearson correlation from exact decimal moments:
    * (n·Σxy - Σx·Σy) / (√(n·Σx² - (Σx)²) · √(n·Σy² - (Σy)²)).
    */
  def dcorr(x: Column, y: Column): Column = {
    val n = count(lit(1)).cast("double")
    val sx = decDouble(sum(dec(x)))
    val sy = decDouble(sum(dec(y)))
    val sxy = decDouble(sum(dec(x) * dec(y)))
    val sx2 = decDouble(sum(dec(x) * dec(x)))
    val sy2 = decDouble(sum(dec(y) * dec(y)))
    (n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy))
  }

  /** Unicode tokenizer: lowercase, split on non-letter/digit runs, drop
    * empties. Mirrors the ES `standard` analyzer semantics the reference
    * relies on (SURVEY.md §2.8 Q6: no accent folding — byte-faithful).
    */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^\\p{L}\\p{N}]+"), t => t =!= "")

  /** Whitespace tokenizer (for oracle-parity text stats). The
    * whitespace class is spelled out because Java's \s includes U+000B
    * while RE2's (DuckDB's) does not — the explicit class is identical
    * to Java \s and is mirrored verbatim in the oracle SQL.
    */
  val wsClass = " \\t\\n\\x0B\\f\\r"
  def wsTokens(c: Column): Column =
    filter(split(trim(c), s"[$wsClass]+"), t => t =!= "")

  /** Exact integer num DIV den over Columns: subtract the remainder so
    * the double division is of an exact multiple — correctly-rounded
    * IEEE division of exact operands ≤ 2^53 yields the exact integer
    * quotient, never the float-floor off-by-one. THE shared helper for
    * the fixed-point ppm/ppb discipline (round-15 review: five
    * independent copies were drifting); callers whose numerators can
    * exceed 2^53 must guard or rescale (see Classify's in-plan guard).
    */
  def exactDiv(num: Column, den: Column): Column =
    ((num - pmod(num, den)) / den).cast("long")

  /** Exact integer parts-per-million: num·10⁶ DIV den. */
  def exactPpm(num: Column, den: Column): Column =
    exactDiv(num * lit(1000000L), den)

  /** Largest count whose `scale`-multiplied numerator stays ≤ 2^53 and
    * therefore divides EXACTLY under [[exactDiv]]'s double division —
    * (2^53 DIV scale) − 1: ~9.0e9 at ppm scale, ~9.0e6 at ppb scale
    * (the ppb bound bites 1000× earlier — the round-15 lesson).
    * Denominators need no bound: when num < den the quotient is an
    * exact 0, and otherwise den ≤ num ≤ 2^53 is already exact.
    */
  def maxExactCnt(scale: Long): Long = (1L << 53) / scale - 1L

  /** Fail-closed exactness guard for the fixed-point discipline: pass
    * `c` through unchanged while ≤ `bound`, raise in-plan past it
    * (shard the input or rescale the fixed point). MUST wrap the value
    * INSIDE the consumed arithmetic — a standalone gate column gets
    * column-pruned and the guard silently vanishes (the round-15
    * 1-row-crossJoin lesson).
    */
  def guardExact(c: Column, bound: Long, ctx: String): Column =
    when(c > bound, raise_error(concat(
      lit(s"$ctx: count "), c.cast("string"),
      lit(s" exceeds the exactness bound $bound — shard the input " +
        "or rescale"))))
      .otherwise(c)
}
