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

  /** Universal-hash minhash prime (Mersenne 2^31 - 1, the MinHashLSH
    * standard): with v, a, b < p every a*v + b stays under 2^62, so
    * the arithmetic is exact int64 in ANY engine — no overflow, no
    * unsigned juggling.
    */
  val minhashP: Long = 2147483647L

  /** == the banded minhash key pipeline of Dedup.minhashLshPairs:
    * one md5 per shingle parsed to v = int of its first 15 hex chars,
    * sig_i = min over shingles of (a_i * (v mod p) + b_i) mod p
    * (Broder '97 with the (a,b) universal-hash family — ONE digest per
    * shingle instead of one per (hash, shingle); Spark MLlib's
    * MinHashLSH uses the same family), band key b = md5 of the band's
    * sig values joined as decimal strings with '|'. Returns the
    * `bands` band keys as one array, computed in a single pass over
    * the shingles.
    */
  def minhashBandKeys(shs: ArrayData, bands: Int, rowsPerBand: Int,
                      as: Array[Long], bs: Array[Long]): ArrayData = {
    val k = bands * rowsPerBand
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shs.numElements()
    var j = 0
    while (j < n) {
      val hexB = md5hex(shs.getUTF8String(j).getBytes).getBytes
      // first 15 hex chars -> 60-bit value (always < 2^63, no sign risk)
      var v = 0L
      var c = 0
      while (c < 15) {
        val ch = hexB(c)
        val d = if (ch <= '9') ch - '0' else ch - 'a' + 10
        v = (v << 4) | d
        c += 1
      }
      val vm = v % minhashP
      var i = 0
      while (i < k) {
        val h = (as(i) * vm + bs(i)) % minhashP
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    val keys = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(24)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append('|')
        // empty shingle sets never reach here (callers filter); a
        // Long.MaxValue sentinel would simply render as its decimal form
        sb.append(mins(b * rowsPerBand + r))
        r += 1
      }
      keys(b) = md5hex(sb.toString.getBytes("UTF-8"))
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

  /** == `aggregate(zip_with(a, b, (x,y) => x*y), 0L, (acc,v) => acc+v)`
    * over long arrays: exact int64 dot product. Length mismatch or a
    * null element yields null (zip_with pads the shorter side with null
    * and the product/sum propagate it); overflow throws like ANSI-mode
    * arithmetic.
    */
  def qdot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** One-pass token statistics (see [[TextStats]]): struct(n_tokens,
    * n_distinct, sum_len in chars, per-list stopword hit counts).
    */
  def textStats(toks: ArrayData,
                swSets: Array[java.util.HashSet[UTF8String]]): org.apache.spark.sql.catalyst.InternalRow = {
    val n = toks.numElements()
    val distinct = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    val hits = new Array[Long](swSets.length)
    var sumLen = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      distinct.add(t)
      sumLen += t.numChars()
      var l = 0
      while (l < swSets.length) {
        if (swSets(l).contains(t)) hits(l) += 1L
        l += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, distinct.size.toLong, sumLen,
        new GenericArrayData(hits)))
  }

  /** == the composed Similarity.signBucket chain: bit p of the bucket
    * key is '1' iff the exact int64 dot of the vector with sign row p
    * is > 0. Length mismatch with the sign row reproduces the composed
    * null-propagation ('0' bit via `when(null > 0)` being false).
    */
  def signBucket(v: ArrayData, signs: Array[Array[Long]]): UTF8String = {
    val out = new Array[Byte](signs.length)
    var p = 0
    while (p < signs.length) {
      val row = signs(p)
      var bit = '0'.toByte
      if (v.numElements() == row.length) {
        var acc = 0L
        var ok = true
        var d = 0
        while (d < row.length && ok) {
          if (v.isNullAt(d)) ok = false
          else {
            acc = Math.addExact(acc, Math.multiplyExact(v.getLong(d), row(d)))
            d += 1
          }
        }
        if (ok && acc > 0L) bit = '1'.toByte
      }
      out(p) = bit
      p += 1
    }
    UTF8String.fromBytes(out)
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
  * posexplode — immune to projection-collapse duplication. The
  * universal-hash (a, b) constants are md5-derived at construction
  * (see [[MinhashBandKeys.hashConsts]]) — deterministic, engine-free,
  * and inlined verbatim into the SQL oracle.
  */
case class MinhashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_band_keys"

  @transient private lazy val (as, bs) = {
    val cs = MinhashBandKeys.hashConsts(bands * rowsPerBand)
    (cs.map(_._1).toArray, cs.map(_._2).toArray)
  }

  override protected def nullSafeEval(shs: Any): Any =
    ShingleUtil.minhashBandKeys(shs.asInstanceOf[ArrayData], bands,
      rowsPerBand, as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.ShingleUtil" +
        s".minhashBandKeys($c, $bands, $rowsPerBand, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeys =
    copy(child = newChild)
}

object MinhashBandKeys {
  /** Deterministic (a_i, b_i) universal-hash constants: md5-derived
    * (like the LSH plane signs), a_i in [1, p-1], b_i in [0, p-1].
    * Computed driver-side so SQL oracles can inline the same literal
    * values.
    */
  def hashConsts(k: Int): Seq[(Long, Long)] = (0 until k).map { i =>
    def h(tag: String): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest(s"$tag|$i".getBytes("UTF-8"))
      // first 7 bytes -> non-negative 56-bit value
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v
    }
    (h("a") % (ShingleUtil.minhashP - 1) + 1, h("b") % ShingleUtil.minhashP)
  }
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
  * lambda. String-min over hex == byte min (ASCII).
  */
case class MinMd5(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_md5"

  override protected def nullSafeEval(arr: Any): Any =
    ShingleUtil.minMd5(arr.asInstanceOf[ArrayData])

  // result is null on an EMPTY (non-null) input, so the generated code
  // re-flags isNull after the call — the standard nullable-result
  // pattern inside nullSafeCodeGen's non-null branch
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.sql.graftnative.ShingleUtil.minMd5($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinMd5 =
    copy(child = newChild)
}

/** Exact int64 dot product of two quantized (long) vectors — identical
  * to `aggregate(zip_with(a, b, (x,y) => x*y), 0L, (acc,v) => acc+v)`
  * including null semantics (length mismatch or a null element yields
  * null, matching zip_with's null-padding propagation) and ANSI
  * overflow behavior (multiplyExact/addExact throw like ANSI-mode
  * arithmetic). One compiled loop instead of a per-element interpreted
  * lambda tree-walk.
  */
case class QDotLong(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType),
      ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_qdot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleUtil.qdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // null result on length-mismatch / null element: re-flag isNull
  // inside the non-null branch (boxed call, one unbox per row)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("qdotRes")
      s"""
         |java.lang.Long $r =
         |  org.apache.spark.sql.graftnative.ShingleUtil.qdot($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDotLong =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane sign-bucket key of a quantized vector — identical
  * to the composed Similarity.signBucket chain of nBits zip_with/
  * aggregate pairs: bit p = '1' iff sum_d qv[d] * sign(md5(p|d)) > 0.
  * The deterministic sign matrix is derived once per expression
  * instance; the per-row cost is one compiled nBits x dims loop.
  */
case class SignBucket(child: Expression, nBits: Int, dims: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_sign_bucket"

  @transient private lazy val signs: Array[Array[Long]] =
    Array.tabulate(nBits) { p =>
      Array.tabulate(dims) { d =>
        val h = MessageDigest.getInstance("MD5")
          .digest(s"$p|$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1L else -1L
      }
    }

  override protected def nullSafeEval(v: Any): Any =
    ShingleUtil.signBucket(v.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the sign matrix rides along as a codegen reference object —
    // computed once per expression instance, shared by all rows
    val signsRef = ctx.addReferenceObj("signs", signs, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.ShingleUtil" +
        s".signBucket($c, $signsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignBucket =
    copy(child = newChild)
}

/** One-pass token statistics for language-ID and quality scoring:
  * struct(n_tokens, n_distinct, sum_len, hits) where hits(i) counts
  * tokens contained in the i-th stopword list. Integer-exact (the
  * IEEE double arithmetic of the quality formula stays in Column land,
  * so scores are bit-identical to the composed form). Replaces ~10
  * interpreted filter/aggregate HOF passes per document — langScore x
  * 5 languages re-evaluated per reference, plus the distinct/length
  * aggregates (PROFILE.md). sum_len counts CHARACTERS (`length()`
  * semantics), accumulated in long (the composed int accumulator would
  * ANSI-throw first on inputs large enough to differ).
  */
case class TextStats(child: Expression, stopwordLists: Seq[Seq[String]])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_len",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("hits",
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "graft_text_stats"

  @transient private lazy val swSets: Array[java.util.HashSet[UTF8String]] =
    stopwordLists.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ShingleUtil.textStats(v.asInstanceOf[ArrayData], swSets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the stopword hash sets ride along as a codegen reference object
    val swRef = ctx.addReferenceObj("swSets", swSets,
      "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftnative.ShingleUtil" +
        s".textStats($c, $swRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}
