package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate is accurate and bit-identical on any partitioning") {
    val df = spark.range(0, 20000).select(($"id" % 3000).as("v"))
    val r = Sketches.hllDistinctAudit(df, col("v")).head()
    val est = r.getAs[Double]("estimate")
    val exact = r.getAs[Long]("n_exact")
    assert(exact === 3000L)
    // 1024 registers -> ~1.04/sqrt(1024) = 3.25% typical error; be generous
    assert(math.abs(est - exact) / exact < 0.15,
      s"estimate $est too far from $exact")
    // determinism: a different partitioning yields the SAME double
    val r2 = Sketches.hllDistinctAudit(df.repartition(7), col("v")).head()
    assert(r2.getAs[Double]("estimate") === est)
    assert(r2.getAs[Long]("n_zero") === r.getAs[Long]("n_zero"))
  }

  test("HLL small-range branch: tiny cardinalities use linear counting") {
    val df = Seq(1L, 2L, 3L, 2L, 1L).toDF("v")
    val r = Sketches.hllDistinctAudit(df, col("v")).head()
    assert(r.getAs[Long]("n_exact") === 3L)
    // 3 distinct values fill at most 3 of 1024 registers -> linear
    // counting branch; estimate must be within 1 of the truth there
    assert(math.abs(r.getAs[Double]("estimate") - 3.0) < 1.0)
  }
}
