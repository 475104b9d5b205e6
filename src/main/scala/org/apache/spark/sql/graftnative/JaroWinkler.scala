/* Lives under org.apache.spark.sql.* for the same reason as
 * HammingDistance.scala — Catalyst's expression-authoring surface is
 * private[sql]. Public API: graft.plans.Native.jaroWinkler.
 */
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990) over string BYTES — the
  * record-linkage scorer with higher recall on short transposed names
  * than the Levenshtein ratio ([[graft.ops.Linkage]]'s pluggable
  * scorer tier). Semantics pinned to the common reference
  * parameterization, byte-for-byte verified against DuckDB 1.0's
  * `jaro_winkler_similarity` on a fixed vector table (NativeSpec):
  *
  *  - match window = max(|a|,|b|)/2 − 1 (floored, never negative),
  *    greedy first-unmatched assignment left to right;
  *  - transpositions = half the mismatched positions among matched
  *    characters in order;
  *  - jaro = (m/|a| + m/|b| + (m−t)/m) / 3; either input empty → 0;
  *  - Winkler boost only when jaro > 0.7: jw = jaro +
  *    0.1 · min(common-prefix, 4) · (1 − jaro).
  *
  * Byte-based (like DuckDB; == char-based on the normalized-ASCII
  * names Linkage feeds it). One compiled loop, two boolean scratch
  * arrays — whole-stage codegen inlines the call; NOT oracle-gated
  * because the oracle gate demands exact-integer replays (q193 uses
  * the Levenshtein ratio for that); this expression is spec-gated.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = org.apache.spark.sql.graftnative.JaroWinkler.compute(
         |  $a.getBytes(), $b.getBytes());
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(x: Array[Byte], y: Array[Byte]): Double = {
    val l1 = x.length
    val l2 = y.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val xm = new Array[Boolean](l1)
    val ym = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!ym(j) && x(i) == y(j)) {
          xm(i) = true; ym(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: mismatches between matched chars taken in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (xm(i)) {
        while (!ym(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && x(p) == y(p)) p += 1
    jaro + 0.1 * p * (1.0 - jaro)
  }
}
