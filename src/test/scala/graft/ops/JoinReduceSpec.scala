package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinReduceSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every build-side key passes the probe predicate") {
    val keys = spark.range(0, 5000).select(($"id" * 37 + 11).as("k"))
    val words = JoinReduce.bloomWords(keys.toDF(), col("k"), mBits = 1 << 14, k = 4)
    // probe with the exact same key set: ALL rows must survive
    val survivors =
      keys.filter(JoinReduce.mightContain(words, 1 << 14, 4, col("k"))).count()
    assert(survivors === 5000L)
  }

  test("reduction: disjoint probe keys are mostly dropped (fp rate bounded)") {
    val build = spark.range(0, 2000).select($"id".as("k"))
    // m/n = 16.4 bits/key, k=4. The register-blocked layout's fpp is a
    // few x the classic ~0.24% (bits concentrate in one word; ~4 keys
    // per word here -> per-word fill ~15/64 -> (15/64)^4 ~ 0.3%, fat-
    // tailed over the Poisson word load) — call it <~1%.
    val mBits = 1 << 15
    val words = JoinReduce.bloomWords(build.toDF(), col("k"), mBits, k = 4)
    val probe = spark.range(100000, 150000).select($"id".as("k")) // disjoint
    val passed =
      probe.filter(JoinReduce.mightContain(words, mBits, 4, col("k"))).count()
    // generous headroom over the expected fp count; a hash-family bug
    // (e.g. all k mask bits collapsing to one) would blow far past this
    assert(passed <= 50000L * 0.024,
      s"false-positive passthrough too high: $passed of 50000")
  }

  test("canonical key typing: int build side, long probe side, zero false negatives") {
    // xxhash64 hashes by physical type; without canonicalization the
    // SAME numeric values under IntegerType vs LongType would hash to
    // different words and silently drop every matching row (ADVICE r9)
    val build = spark.range(0, 4000)
      .select(($"id" * 3).cast("int").as("k"))
    val words = JoinReduce.bloomWords(build.toDF(), col("k"), 1 << 14, 4)
    val probe = spark.range(0, 4000).select(($"id" * 3).as("k")) // long
    val survivors = probe
      .filter(JoinReduce.mightContain(words, 1 << 14, 4,
        JoinReduce.canonKey(probe.toDF(), col("k"))))
      .count()
    assert(survivors === 4000L)
    // and the int probe against its own build also survives in full
    val intSurvivors = build
      .filter(JoinReduce.mightContain(words, 1 << 14, 4,
        JoinReduce.canonKey(build.toDF(), col("k"))))
      .count()
    assert(intSurvivors === 4000L)
  }

  test("bloomReducedJoin equals the plain exact join") {
    val large = spark.range(0, 20000)
      .select(($"id" % 700).as("k"), ($"id" * 3).as("payload"))
    val small = spark.range(0, 120)
      .select(($"id" * 5).as("sk"), concat(lit("n"), $"id").as("name"))
    val viaBloom = JoinReduce
      .bloomReducedJoin(large.toDF(), "k", small.toDF(), "sk",
        mBits = 1 << 12, k = 4)
      .select($"k", $"payload", $"name")
    val plain = large.join(small, $"k" === $"sk")
      .select($"k", $"payload", $"name")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty,
      "bloom-reduced join diverged from the exact join")
  }

  test("bitset words bound: build side larger than mBits still works") {
    // more distinct keys than bits: the filter saturates toward
    // all-pass but must stay CORRECT (no false negatives)
    val build = spark.range(0, 5000).select($"id".as("k"))
    val words = JoinReduce.bloomWords(build.toDF(), col("k"), mBits = 1 << 6, k = 2)
    assert(words.length === 1)
    val survivors =
      build.filter(JoinReduce.mightContain(words, 1 << 6, 2, col("k"))).count()
    assert(survivors === 5000L)
  }

  test("persisted asset round-trip: identical predicate behavior") {
    val build = spark.range(0, 3000).select(($"id" * 13).as("k"))
    JoinReduce.writeBloomAsset(build.toDF(), col("k"), 1 << 14, 4,
      "jrspec_bloom")
    // no false negatives through the asset
    val survivors = build
      .filter(JoinReduce.mightContainFromAsset(spark, "jrspec_bloom",
        build.toDF(), col("k")))
      .count()
    assert(survivors === 3000L)
    // asset predicate == in-memory predicate on a mixed probe set
    val words = JoinReduce.bloomWords(build.toDF(), col("k"), 1 << 14, 4)
    val probe = spark.range(0, 50000).select($"id".as("k"))
    val viaAsset = probe
      .filter(JoinReduce.mightContainFromAsset(spark, "jrspec_bloom",
        probe.toDF(), col("k")))
      .count()
    val viaWords = probe
      .filter(JoinReduce.mightContain(words, 1 << 14, 4, col("k"))).count()
    assert(viaAsset === viaWords)
    // an int-typed probe canonicalizes to the recorded long family and
    // still sees every build key
    val intProbe = build.select($"k".cast("int").as("k"))
    val viaInt = intProbe
      .filter(JoinReduce.mightContainFromAsset(spark, "jrspec_bloom",
        intProbe.toDF(), col("k")))
      .count()
    assert(viaInt === 3000L)
    // a probe whose canonical type differs from the recorded build
    // type fails FAST instead of silently dropping every row
    val strProbe = build.select($"k".cast("string").as("k"))
    intercept[IllegalArgumentException] {
      JoinReduce.mightContainFromAsset(spark, "jrspec_bloom",
        strProbe.toDF(), col("k"))
    }
  }

  test("parameter validation") {
    val df = spark.range(3).select($"id".as("k")).toDF()
    intercept[IllegalArgumentException] {
      JoinReduce.bloomWords(df, col("k"), mBits = 100, k = 4) // not mult of 64
    }
    intercept[IllegalArgumentException] {
      JoinReduce.bloomWords(df, col("k"), mBits = 1 << 27, k = 4) // over cap
    }
    intercept[IllegalArgumentException] {
      JoinReduce.bloomWords(df, col("k"), mBits = 64, k = 0)
    }
    intercept[IllegalArgumentException] {
      JoinReduce.mightContain(new Array[Long](2), 64, 2, col("k")) // len mismatch
    }
  }
}
