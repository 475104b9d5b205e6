package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: executed plan + stage timing of q151's ORIENTED edge-seal
  * job alone (the part invisible in the gate entry's own plan).
  */
object ProfileTriBuild {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32",
      Map("spark.sql.autoBroadcastJoinThreshold" -> "64m"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val edges = graft.ops.Graphs.coOccurrenceEdges(
      graft.Tables.load(spark, sfDir, "lineitem"), "l_orderkey", "l_partkey")
    val und = graft.ops.Graphs.undirected(edges)
    val deg = und.select($"a".as("n")).unionAll(und.select($"b".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("d"))
    val orientedPlan = und
      .join(deg.as("da"), $"a" === col("da.n"))
      .join(deg.as("db"), $"b" === col("db.n"))
      .select(
        when(struct(col("da.d"), $"a") < struct(col("db.d"), $"b"),
          struct($"a".as("u"), $"b".as("v"), col("db.d").as("dv")))
          .otherwise(struct($"b".as("u"), $"a".as("v"),
            col("da.d").as("dv"))).as("e"))
      .select($"e.u".as("u"), $"e.v".as("v"), $"e.dv".as("dv"))
    // warm once, then time the build alone
    orientedPlan.write.mode("overwrite").format("noop").save()
    val t0 = System.nanoTime()
    orientedPlan.write.mode("overwrite").format("noop").save()
    println(f"[tri-build] oriented build ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(orientedPlan.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
