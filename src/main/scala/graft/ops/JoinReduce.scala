package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction (a runtime row filter): before a
  * shuffle join whose build side is selective but too large to
  * broadcast AS ROWS, ship a compact Bloom bitset of its join keys and
  * drop probe-side rows that cannot match BEFORE they enter the
  * exchange. The final join stays exact, so Bloom false positives cost
  * only wasted shuffle bytes — never wrong rows — and false negatives
  * are impossible (build and probe evaluate the same in-plan hash
  * expressions over the same key values).
  *
  * This is the explicit, engine-controlled form of Spark's own
  * `InjectRuntimeFilter` (spark.sql.optimizer.runtime.bloomFilter.*,
  * which injects a BloomFilterAggregate subquery under the same
  * conditions). Hand-rolling it buys three things the optimizer rule
  * cannot promise: (1) it applies to any plan shape, including joins
  * the rule's creation-side heuristics skip; (2) the filter can be
  * BUILT ONCE and reused across many queries against the same
  * selective side (the rule rebuilds per query); (3) the hash family
  * is pinned here, so a persisted bitset is replayable by any engine.
  *
  * 100 TB window (same as the optimizer rule's): the probe side is
  * fact-scale and shuffle-joined; the build side has too many ROWS /
  * too wide a payload to broadcast, but its KEY SET fits a bitset of
  * `mBits` bits. At 16 bits/key a 10M-key build side is a 20 MB
  * bitset vs gigabytes of broadcast rows. Beyond ~100M keys the
  * bitset itself stops fitting — that is the documented cap, not a
  * silent degradation ([[bloomWords]] refuses mBits > 2^26).
  *
  * Zero UDFs: positions are `pmod(xxhash64(j, key), m)` (codegen'd,
  * the same hash Spark's runtime filter uses), the bitset test is
  * `element_at` + shift/mask over a single array literal.
  */
object JoinReduce {

  /** Hard cap on the bitset size: 2^26 bits = 8 MiB = 1M int64 words.
    * Keeps both the driver materialization and the per-task literal
    * bounded; ~4M keys at 16 bits/key. Mirrors the cap philosophy of
    * spark.sql.optimizer.runtime.bloomFilter.maxNumBits (default 64M).
    */
  val MaxBits: Int = 1 << 26

  /** Bit position of `key` under hash row `j`: the j-th member of the
    * family is xxhash64 with j prepended (distinct int literals give
    * fully decorrelated 64-bit mixes), reduced mod mBits. Evaluated by
    * codegen on BOTH the build and probe side — one expression, no
    * driver/executor twin to drift.
    */
  def bloomPos(j: Int, key: Column, mBits: Int): Column =
    pmod(xxhash64(lit(j), key), lit(mBits.toLong))

  /** Build the bitset over the build side's distinct key positions.
    *
    * Plan shape: one linear pass over `small`, a k-wide Generate, a
    * distinct bounded by mBits rows (partial dedup caps every
    * partition's contribution), then a bit_or word aggregate bounded
    * by mBits/64 rows. The returned array is a BOUNDED driver
    * materialization — at most mBits/64 <= 1M longs (8 MiB), enforced
    * below; this is the same driver-side step Spark's own runtime
    * filter performs when it evaluates the BloomFilterAggregate
    * subquery, not a corpus-sized collect.
    */
  def bloomWords(small: DataFrame, key: Column, mBits: Int, k: Int): Array[Long] = {
    require(mBits >= 64 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(mBits <= MaxBits, s"mBits must be <= $MaxBits (8 MiB bitset), got $mBits")
    require(k >= 1 && k <= 8, s"k must be 1..8, got $k")
    val posCols = (0 until k).map(j => bloomPos(j, key, mBits))
    val words = small
      .select(explode(array(posCols: _*)).as("pos"))
      .distinct()
      .select(
        floor(col("pos") / 64).cast("long").as("w"),
        expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("bits"))
      .collect() // bounded: <= mBits/64 rows (see scaladoc)
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** The probe-side membership predicate: true iff ALL k bits of `key`
    * are set in `words`. The bitset rides along as ONE array literal
    * (a plan constant shipped with the task binary, like a broadcast
    * but with zero join machinery); each test is an O(1) element_at +
    * shift + mask, k per row, all inside whole-stage codegen.
    */
  def mightContain(words: Array[Long], mBits: Int, k: Int, key: Column): Column = {
    require(words.length.toLong * 64 == mBits.toLong,
      s"words.length ${words.length} does not match mBits $mBits")
    val wl = typedLit(words.toSeq)
    (0 until k).map { j =>
      val pos = bloomPos(j, key, mBits)
      val word = element_at(wl, (floor(pos / 64) + 1).cast("int"))
      val bit = call_function("shiftright", word, pmod(pos, lit(64L)).cast("int"))
      bit.bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Persist the bitset as a 1-row asset table — the "build once,
    * reuse across queries" half of the reduction's economics: the
    * build side (often a slowly-changing dimension or a curated key
    * list) pays its scan once, and every later query against the
    * fact table starts from a catalog read of mBits/8 bytes. Stored
    * with its parameters so a probe cannot silently mix hash
    * families; stage-and-swap via [[graft.Tables.writeTable]].
    */
  def writeBloomAsset(small: DataFrame, key: Column, mBits: Int, k: Int,
                      table: String): Unit = {
    val words = bloomWords(small, key, mBits, k)
    val spark = small.sparkSession
    import spark.implicits._
    graft.Tables.writeTable(
      Seq((words.toSeq, mBits, k)).toDF("words", "m_bits", "k"), table)
  }

  /** The probe predicate rebuilt from a persisted asset — a 1-row
    * bounded catalog read, then identical to [[mightContain]].
    */
  def mightContainFromAsset(spark: org.apache.spark.sql.SparkSession,
                            table: String, key: Column): Column = {
    val row = spark.table(table).head()
    mightContain(row.getAs[Seq[Long]]("words").toArray,
      row.getAs[Int]("m_bits"), row.getAs[Int]("k"), key)
  }

  /** The composed operator: filter `large` through a Bloom of
    * `small`'s keys, then join exactly. The join itself is left
    * unhinted — at real scale the optimizer picks the shuffle join
    * this reduction exists for; demos that need to pin the join
    * strategy compose [[bloomWords]]/[[mightContain]] directly and
    * hint the join themselves (q123 does, to keep the demonstration
    * honest on a build side small enough to broadcast).
    *
    * `small` is evaluated twice (once for the bitset, once for the
    * join) — build-side-sized both times, and at scale the bitset
    * build is the cheap pass you amortize by persisting `words`.
    */
  def bloomReducedJoin(large: DataFrame, largeKey: String,
                       small: DataFrame, smallKey: String,
                       mBits: Int = 1 << 16, k: Int = 4): DataFrame = {
    val words = bloomWords(small, col(smallKey), mBits, k)
    large.filter(mightContain(words, mBits, k, col(largeKey)))
      .join(small, col(largeKey) === col(smallKey))
  }
}
