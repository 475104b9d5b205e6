/* Lives under org.apache.spark.sql.* for the same reason as
 * HammingDistance.scala — Catalyst's expression-authoring surface is
 * private[sql]. Public API: graft.plans.Native.nfcNormalize.
 */
package org.apache.spark.sql.graftnative

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) — the
  * text-canonicalization step a multilingual corpus needs BEFORE
  * hashing-based dedup: "é" spelled as U+00E9 and as e+U+0301 are the
  * same text to a reader but different bytes to md5/minhash/simhash,
  * so un-normalized corpora silently under-dedup (and vocabularies
  * split one word type in two).
  *
  * Spark has no built-in normalizer, and a Scala UDF would break
  * whole-stage codegen — so this is the (b)-tier native form: one
  * static call into the JDK's `java.text.Normalizer`, with the
  * `isNormalized` quick-check as the fast path (pure-ASCII and
  * already-composed strings — the overwhelming majority of a real
  * corpus — return the INPUT UTF8String, zero allocation).
  *
  * Both the JDK and DuckDB's `nfc_normalize` implement UAX #15, so
  * the result is oracle-comparable (q198 proves composition parity on
  * deterministically-derived decomposed text).
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
