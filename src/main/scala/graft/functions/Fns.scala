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

  /** Order-independent SUM of a double column (exact decimal internally). */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact sum of an already-decimal expression, returned as double. */
  def dsumExpr(e: Column): Column = sum(e).cast("double")

  /** Order-independent AVG: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)

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
}
