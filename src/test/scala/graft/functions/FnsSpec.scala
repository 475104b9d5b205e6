package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Fns._

class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("decDouble is the correctly-rounded double of a wide decimal") {
    // 26916676217.06 is exactly the value whose direct decimal->double
    // cast double-rounds in engines converting int128 storage first
    val wide = Seq("26916676217.06000000").toDF("s")
      .select($"s".cast("decimal(38,8)").as("d"))
    val got = wide.select(decDouble($"d")).as[Double].head()
    assert(got === new java.math.BigDecimal("26916676217.06").doubleValue())
  }

  test("dvar/dstd match a BigDecimal reference computation") {
    val xs = Seq(12.31, 6.55, 1.63, 99.99, 42.0, 7.77)
    val got = xs.toDF("v").agg(dvar($"v"), dstd($"v")).head()
    // reference: same moment formula over exact decimals
    val q = xs.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP))
    val n = xs.length.toDouble
    val s = q.sum.toDouble
    val s2 = q.map(x => x * x).sum.toDouble
    val expVar = (s2 - s * s / n) / (n - 1.0)
    assert(got.getDouble(0) === expVar)
    assert(got.getDouble(1) === math.sqrt(expVar))
  }

  test("dvar is invariant to partition layout (order-independence)") {
    val xs = (1 to 1000).map(i => (i % 97) * 1.37)
    val one = xs.toDF("v").repartition(1).agg(dvar($"v")).head().getDouble(0)
    val many = xs.toDF("v").repartition(13).agg(dvar($"v")).head().getDouble(0)
    assert(one === many)
  }

  test("dcorr: perfectly correlated and anti-correlated columns") {
    val d = (1 to 50).map(i => (i.toDouble, 2.0 * i + 1, -3.0 * i))
      .toDF("x", "y", "z")
    val r = d.agg(dcorr($"x", $"y"), dcorr($"x", $"z")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
  }
}
