/* This file lives under org.apache.spark.sql.* because Catalyst's
 * expression-authoring surface (ExpectsInputTypes / AbstractDataType /
 * the Column<->Expression bridge in classic.ExpressionUtils) is
 * private[sql] in Spark 4 — the standard pattern for Spark extension
 * libraries. Public API is re-exported from graft.plans.Native.
 */
package org.apache.spark.sql.graftnative

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers invoked from both interpreted eval and generated code.
  * Semantics are bit-identical to the composed built-in forms they
  * replace (documented per method) — the DuckDB oracles are unchanged.
  */
object ShingleUtil {
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5hex(parts: Array[Byte]*): UTF8String = {
    val md = MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    val d = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** == `array_distinct(transform(sequence(1, n-k+1), i =>
    *      concat_ws(" ", slice(toks, i, k))))`
    * (TextAnalysis.shingles + distinct): word k-gram shingles joined by
    * a single space, first-occurrence order, empty array when the doc
    * has fewer than k tokens. Null tokens are skipped by concat_ws; the
    * inputs here (split output) never contain them.
    */
  def distinctShingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, n * 2))
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) {
        parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](Array.empty[AnyRef]))
  }

  /** == the banded minhash key pipeline of Dedup.minhashLshPairs:
    * sig_i = min over shingles of md5(i || "|" || sh) (string min over
    * hex = byte min, Broder '97 with the md5-prefix family), band key
    * b = md5(sig_{b*r} || "|" || ... || sig_{b*r+r-1}). Returns the
    * `bands` band keys as one array, computed in a single pass over the
    * shingles — one expression node instead of bands*rowsPerBand
    * interpreted HOF chains.
    */
  def minhashBandKeys(shs: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val k = bands * rowsPerBand
    val prefixes = Array.tabulate(k)(i => (i.toString + "|").getBytes("UTF-8"))
    val mins = new Array[UTF8String](k)
    val n = shs.numElements()
    var j = 0
    while (j < n) {
      val shBytes = shs.getUTF8String(j).getBytes
      var i = 0
      while (i < k) {
        val h = md5hex(prefixes(i), shBytes)
        if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
        i += 1
      }
      j += 1
    }
    val sepBytes = "|".getBytes("UTF-8")
    val keys = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      val md = MessageDigest.getInstance("MD5")
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) md.update(sepBytes)
        // n == 0 never reaches here in practice (callers filter empty
        // shingle sets); guard with empty bytes for safety.
        val m = mins(b * rowsPerBand + r)
        if (m != null) md.update(m.getBytes)
        r += 1
      }
      val d = md.digest()
      val out = new Array[Byte](32)
      var i = 0
      while (i < 16) {
        out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
        out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
        i += 1
      }
      keys(b) = UTF8String.fromBytes(out)
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** == the TextAnalysis.simhash composed chain: per bit j, vote =
    * sum over tokens of (bit(j) * 2 - 1) where bit(j) = bit j%4 of hex
    * nibble j/4 of the token's md5; output char j = '1' iff vote > 0.
    * Null elements are skipped (cannot occur for transform(md5) input).
    */
  def simhash(mds: ArrayData, bits: Int): UTF8String = {
    val votes = new Array[Int](bits)
    val n = mds.numElements()
    var t = 0
    while (t < n) {
      if (!mds.isNullAt(t)) {
        val b = mds.getUTF8String(t).getBytes
        var j = 0
        while (j < bits) {
          val c = b(j / 4)
          val v =
            if (c >= '0' && c <= '9') c - '0'
            else c - 'a' + 10
          votes(j) += ((v >> (j % 4)) & 1) * 2 - 1
          j += 1
        }
      }
      t += 1
    }
    val out = new Array[Byte](bits)
    var j = 0
    while (j < bits) {
      out(j) = if (votes(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** == `array_min(transform(arr, x => md5(x)))`: minimum md5 hex over
    * the array's elements; null on empty input. Null elements skipped
    * (array_min ignores nulls).
    */
  def minMd5(arr: ArrayData): UTF8String = {
    var min: UTF8String = null
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5hex(arr.getUTF8String(i).getBytes)
        if (min == null || h.compareTo(min) < 0) min = h
      }
      i += 1
    }
    min
  }
}

/** Distinct word k-gram shingles of a token array (see
  * [[ShingleUtil.distinctShingles]]). Replaces an interpreted
  * sequence/transform/slice/concat_ws/array_distinct HOF chain whose
  * per-document cost is O(tokens * k) tree-walk evaluations — measured
  * 5.4s -> sub-second over 5k docs at sf0.1.
  */
case class DistinctShingles(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(toks: Any): Any =
    ShingleUtil.distinctShingles(toks.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.ShingleUtil" +
        s".distinctShingles($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

/** Banded minhash bucket keys of a shingle-set array (see
  * [[ShingleUtil.minhashBandKeys]]). One pass computes every band key,
  * so the plan carries a single expensive expression consumed once by
  * posexplode — immune to projection-collapse duplication.
  */
case class MinhashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_band_keys"

  override protected def nullSafeEval(shs: Any): Any =
    ShingleUtil.minhashBandKeys(shs.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.ShingleUtil" +
        s".minhashBandKeys($c, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeys =
    copy(child = newChild)
}

/** SimHash fingerprint of a per-token md5-hex array as a '0'/'1'
  * bit-string (Charikar, STOC'02) — bit j is derived from hex nibble
  * j/4, bit j%4 of each token's md5, votes summed exactly in integers.
  * Identical output to the composed TextAnalysis.simhash chain of
  * `bits` aggregate-HOF expressions, which walk the interpreter per
  * token PER BIT (64 x tokens tree-walks/doc — measured 10.7s -> ~1s
  * over sf0.1 docs). Inputs must be lowercase hex strings of >= bits/4
  * chars (md5 output always is).
  */
case class Simhash(child: Expression, bits: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(bits > 0 && bits <= 128, s"simhash bits must be 1..128, got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(mds: Any): Any =
    ShingleUtil.simhash(mds.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.ShingleUtil" +
        s".simhash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Simhash =
    copy(child = newChild)
}

/** Minimum md5 hex over the elements of a string array; null on empty
  * input (so callers can coalesce a fallback). == `array_min(
  * transform(arr, x => md5(x)))` without the per-element interpreted
  * lambda. String-min over hex == byte min (ASCII). CodegenFallback:
  * the output is nullable on non-null input, which nullSafeCodeGen
  * cannot express; the fallback is one virtual call per row and keeps
  * the surrounding stage in whole-stage codegen.
  */
case class MinMd5(child: Expression)
  extends UnaryExpression with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_md5"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) null
    else ShingleUtil.minMd5(arr.asInstanceOf[ArrayData])
  }

  override protected def withNewChildInternal(newChild: Expression): MinMd5 =
    copy(child = newChild)
}
