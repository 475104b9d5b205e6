package graft

import org.apache.spark.sql.SparkSession

/** Single source of truth for the local SparkSession config. The
  * timeZone and nanosAsLong settings are correctness-load-bearing
  * (Tables.load's ns->us normalization and every oracle's timestamp
  * comparison assume them) — hand-copied builder blocks drifting apart
  * would silently diverge bench plans from verified plans.
  */
object LocalSession {
  def build(cpus: String, extraConf: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // explicit (not just the default): the LSH band-bucket candidate
      // self-joins rely on AQE skew-split to rebalance hot buckets
      // under the maxBucket cap — PlanSpec asserts this stays on
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }
}
