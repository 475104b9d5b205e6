package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Summary

/** Isolated profile for the materialized-aggregate tier: times the
  * plain fact-table report aggregate against (a) the explicit partial
  * re-merge ([[Summary.rollup]]) and (b) the SAME SQL transparently
  * redirected by [[graft.plans.SummaryRewrite]], plus the build and
  * incremental-refresh walls and the scan-row evidence (the summary
  * row count vs the fact row count — the ratio that scales with data
  * while the serve cost does not). Scratch tool, not library surface.
  */
object ProfileSummary {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.Fns._

    def times(name: String, runs: Int = 5)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[summary] $name%-22s min ${ts.head}%.3f  med ${ts(ts.size / 2)}%.3f  max ${ts.last}%.3f")
    }
    def wall(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[summary] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val dims = Seq("l_returnflag", "l_linestatus")
    val measures = Seq("l_quantity", "l_extendedprice")
    val li = Tables.load(spark, sfDir, "lineitem")
    println(s"[summary] fact rows: ${li.count()}")

    wall("build (writeSummary)") {
      Summary.writeSummary(li, "prof_summary", dims, measures)
    }
    println(s"[summary] summary rows: ${spark.table("prof_summary").count()}")

    def plainAgg: DataFrame =
      li.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"))
    def servedAgg: DataFrame =
      Summary.rollup(spark.table("prof_summary"), Seq("l_returnflag"), measures)
        .select($"l_returnflag", $"n_rows".as("n"),
          decDouble($"sum_l_quantity").as("sum_qty"),
          $"min_l_extendedprice".as("min_price"),
          $"max_l_extendedprice".as("max_price"))

    times("plain fact aggregate")(plainAgg)
    times("summary serve")(servedAgg)

    // the transparent path: same SQL, optimizer redirects to partials
    Summary.register(li, "prof_summary")
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.SummaryRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SummaryRewrite
    li.createOrReplaceTempView("prof_li")
    val sql =
      """SELECT l_returnflag, count(*) AS n,
        | min(l_extendedprice) AS min_price,
        | max(l_extendedprice) AS max_price,
        | cast(cast(sum(cast(l_quantity AS decimal(18,4))) AS string) AS double) AS sum_qty
        |FROM prof_li GROUP BY l_returnflag""".stripMargin
    times("sql via rewrite")(spark.sql(sql))
    Summary.deregister(li)
    times("sql unrewritten")(spark.sql(sql))

    // refresh cost: append ~3% of the corpus as a managed-table delta
    Tables.writeTable(li.repartition(32), "prof_sum_base")
    wall("build on table") {
      Summary.writeSummary(spark.table("prof_sum_base"), "prof_summary_t",
        dims, measures)
    }
    graft.ops.Layout.appendPlain(
      li.filter($"l_orderkey" % 32 === 0).repartition(1), "prof_sum_base")
    wall("incremental refresh") {
      val read = Summary.refreshSummary(spark, spark.table("prof_sum_base"),
        "prof_summary_t")
      println(s"[summary] refresh read $read delta file(s)")
    }

    // the scale argument, measured: a 10x corpus grows the plain
    // aggregate's wall with the table while the serve stays at the
    // summary-sized constant (dims cardinality does not grow)
    val li10 = (1 to 10).map(i =>
        li.withColumn("l_orderkey", $"l_orderkey" + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    Tables.writeTable(li10.repartition(64), "prof_sum_base10")
    val b10 = spark.table("prof_sum_base10")
    println(s"[summary] 10x fact rows: ${b10.count()}")
    wall("build 10x") {
      Summary.writeSummary(b10, "prof_summary10", dims, measures)
    }
    def plainAgg10: DataFrame =
      b10.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"))
    def servedAgg10: DataFrame =
      Summary.rollup(spark.table("prof_summary10"), Seq("l_returnflag"),
          measures)
        .select($"l_returnflag", $"n_rows".as("n"),
          decDouble($"sum_l_quantity").as("sum_qty"),
          $"min_l_extendedprice".as("min_price"),
          $"max_l_extendedprice".as("max_price"))
    times("plain fact agg 10x")(plainAgg10)
    times("summary serve 10x")(servedAgg10)
    spark.stop()
  }
}
