/* Lives under org.apache.spark.sql.* for the same reason as
 * HammingDistance.scala — Catalyst's expression-authoring surface is
 * private[sql]. Public API: graft.plans.Native.bpeMerge.
 */
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge replay over one word — the native form of
  * [[graft.ops.TextAnalysis.bpeSegment]]'s per-word replace chain,
  * which is the hot inner loop of the pass that actually runs over
  * 100 TB (training touches the Zipf-bounded type table; SEGMENTATION
  * touches every token occurrence of every document).
  *
  * Semantics are EXACTLY the composed form's, per word:
  * words under 2 code points or containing the `\u001f` separator
  * pass through as a single symbol (the training contract's guard);
  * otherwise the word splits into code-point symbols and each merge
  * (rank order) rewrites adjacent (lft, rgt) symbol pairs
  * left-to-right, non-overlapping, resuming AFTER the merged symbol —
  * the exact scan rule of `replace()` over the wrapped-separator
  * string encoding (a match consumes "␟lft␟␟rgt␟" and the search
  * resumes after it, so a freshly merged symbol can never be the left
  * half of another match in the same round). The equality is
  * property-tested against the composed chain in NativeSpec and
  * oracle-proven end-to-end (q199 runs the native path under q178's
  * unchanged DuckDB oracle).
  *
  * Why native: the composed form folds `nMerges` literal `replace`
  * calls into the plan — each a full scan AND rebuild of the
  * separator-wrapped string (~3× word bytes), so apply cost is
  * O(nMerges × wordLen) string allocations per token OCCURRENCE. Here
  * each round is a pointer-bump scan over a small symbol array, with
  * no allocation at all for rounds whose pair does not occur in the
  * word (the overwhelming majority under Zipf — a 200-merge table
  * applies a handful of merges to a typical word).
  */
case class BpeMergeWord(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge"

  // (lft, rgt, merged) per rank — merged precomputed once, not per hit
  @transient private lazy val mergeArr: Array[Array[String]] =
    merges.map { case (l, r) => Array(l, r, l + r) }.toArray

  override protected def nullSafeEval(w: Any): Any =
    BpeMergeWord.compute(w.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the merge table rides along as a codegen reference object —
    // built once per expression instance, shared by all rows
    val mRef = ctx.addReferenceObj("bpeMerges", mergeArr, "String[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.BpeMergeWord" +
        s".compute($c, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeWord =
    copy(child = newChild)
}

object BpeMergeWord {
  private final val Sep = '\u001f'

  /** Static entry shared by interpreted eval and generated code. */
  def compute(w: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val s = w.toString
    // training-contract guard, identical to the composed `when`:
    // char_length counts code points, as does codePointCount
    if (s.indexOf(Sep) >= 0 || s.codePointCount(0, s.length) < 2)
      return new GenericArrayData(Array[Any](w))
    // split into code-point symbols (the `(?s)(.)` wrap: Java regex
    // '.' and RE2 '.' both match one code point)
    var len = s.codePointCount(0, s.length)
    val syms = new Array[String](len)
    var off = 0
    var ci = 0
    while (off < s.length) {
      val cc = Character.charCount(s.codePointAt(off))
      syms(ci) = s.substring(off, off + cc)
      ci += 1
      off += cc
    }
    var mi = 0
    while (mi < merges.length && len >= 2) {
      val l = merges(mi)(0)
      val r = merges(mi)(1)
      // find-first probe: rounds whose pair is absent cost one scan,
      // zero writes, zero allocation
      var i = 0
      var found = -1
      while (i < len - 1 && found < 0) {
        if (syms(i) == l && syms(i + 1) == r) found = i else i += 1
      }
      if (found >= 0) {
        val merged = merges(mi)(2)
        // left-to-right non-overlapping rewrite, in place: a match
        // consumes both symbols and the scan resumes after them
        var wr = found
        var rd = found
        while (rd < len) {
          if (rd < len - 1 && syms(rd) == l && syms(rd + 1) == r) {
            syms(wr) = merged
            rd += 2
          } else {
            syms(wr) = syms(rd)
            rd += 1
          }
          wr += 1
        }
        len = wr
      }
      mi += 1
    }
    val out = new Array[Any](len)
    var oi = 0
    while (oi < len) {
      out(oi) = UTF8String.fromString(syms(oi))
      oi += 1
    }
    new GenericArrayData(out)
  }
}
