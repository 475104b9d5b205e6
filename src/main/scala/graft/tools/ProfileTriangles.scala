package graft.tools

import org.apache.spark.sql.DataFrame
import graft.ops.Graphs

/** Isolated A/B for the triangle closing-join Bloom reduction: same
  * JVM, interleaved runs, plus the wedge/survivor row counts that
  * justify (or refute) the filter at this scale. Scratch tool.
  */
object ProfileTriangles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    val edges = Graphs.coOccurrenceEdges(
      graft.Tables.load(spark, sfDir, "lineitem"), "l_orderkey", "l_partkey")

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths
    time(Graphs.triangleCounts(edges, bloomBits = 0))
    time(Graphs.triangleCounts(edges))
    val (off, on) = (1 to 3).map { _ =>
      (time(Graphs.triangleCounts(edges, bloomBits = 0)),
        time(Graphs.triangleCounts(edges)))
    }.unzip
    println(f"[tri] bloom OFF min ${off.min}%.2f  runs ${off.map(t => f"$t%.2f").mkString(" ")}")
    println(f"[tri] bloom ON  min ${on.min}%.2f  runs ${on.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }
}
