package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns._

/** Scratch profiling main (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val li = Tables.load(spark, sfDir, "lineitem")

    time("scan_only")(li.select($"l_quantity"))
    time("plain_double_agg") {
      li.filter($"l_shipdate" < lit("1999-01-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity"), sum($"l_extendedprice"),
          sum($"l_extendedprice" * (lit(1.0) - $"l_discount")),
          avg($"l_quantity"), avg($"l_extendedprice"), avg($"l_discount"),
          count(lit(1)))
    }
    time("decimal_agg_as_now") {
      li.filter($"l_shipdate" < lit("1999-01-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(dsum($"l_quantity"), dsum($"l_extendedprice"),
          dsumExpr(dec($"l_extendedprice") * (oneD - dec($"l_discount"))),
          davg($"l_quantity"), davg($"l_extendedprice"), davg($"l_discount"),
          count(lit(1)))
    }
    time("decimal_source_cast_once") {
      val pre = li.filter($"l_shipdate" < lit("1999-01-01").cast("timestamp"))
        .select($"l_returnflag", $"l_linestatus",
          dec($"l_quantity").as("q"), dec($"l_extendedprice").as("p"),
          dec($"l_discount").as("d"))
      pre.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"q"), sum($"p"), sum($"p" * (oneD - $"d")),
          avg($"q"), avg($"p"), avg($"d"), count(lit(1)))
    }
    time("scaled_long_agg") {
      val pre = li.filter($"l_shipdate" < lit("1999-01-01").cast("timestamp"))
        .select($"l_returnflag", $"l_linestatus",
          round($"l_quantity" * 1e4).cast("long").as("q"),
          round($"l_extendedprice" * 1e4).cast("long").as("p"),
          round($"l_discount" * 1e4).cast("long").as("d"))
      pre.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"q"), sum($"p"),
          sum(($"p".cast("decimal(18,0)") * (lit(10000L) - $"d")).cast("decimal(28,0)")),
          count(lit(1)))
    }
    val ord = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer")
    time("q03_as_now")(graft.queries.Relational.q03(spark, sfDir))
    time("q03_preagg") {
      val liAgg = li.groupBy($"l_orderkey")
        .agg(sum(dec($"l_extendedprice") * (oneD - dec($"l_discount")))
          .as("o_rev"))
      liAgg.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name")
        .agg(sum($"o_rev").cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"revenue".desc, $"c_custkey".asc)
        .limit(20)
    }

    time("q10_as_now")(graft.queries.Relational.q10(spark, sfDir))
    time("q10_collect_set") {
      li.groupBy($"l_orderkey")
        .agg(size(collect_set($"l_suppkey")).cast("long").as("n_supp"),
          size(collect_set($"l_partkey")).cast("long").as("n_part"))
        .groupBy($"n_supp", $"n_part")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"n_supp", $"n_part")
    }
    time("q10_split_distinct") {
      val ns = li.select($"l_orderkey", $"l_suppkey").distinct()
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n_supp"))
      val np = li.select($"l_orderkey", $"l_partkey").distinct()
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n_part"))
      ns.join(np, Seq("l_orderkey"))
        .groupBy($"n_supp", $"n_part")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"n_supp", $"n_part")
    }

    // Replicate the Bench sequence: warm all 7, then time each fresh build.
    val names = graft.SparkEntry.benchQueries
    def force(n: String): Unit =
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    names.foreach(force)
    names.foreach { n =>
      val t0 = System.nanoTime()
      force(n)
      println(f"[prof] bench:$n%-27s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val t0 = System.nanoTime()
    force("q01_pricing_summary")
    println(f"[prof] bench:q01_again ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
