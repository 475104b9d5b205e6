package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 graph-family scaling soak: HITS, personalized PageRank
  * and frontier Bellman-Ford cheapest paths timed at 1x/3x/10x over a
  * synthetic sink-free multigraph of fixed mean degree. Near-linear
  * growth is the measured form of the scale claim: every round of all
  * three is one edges⋈score equi-join + one keyed aggregate (plus the
  * 1-row max broadcast for HITS), so cost should track the edge count
  * — not the round count times anything worse. Writes to /tmp only.
  * Scratch tool, not part of the library surface.
  */
object ScaleSoakGraphs {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => DataFrame): Double = {
      f.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[soak-graphs] $name%-26s $s%8.3f s")
      s
    }

    // sink-free synthetic multigraph: n nodes, 10 edges per node
    // (every node appears as src by construction — id DIV 10 covers
    // 0..n-1 — so skipSinkCheck is contract-safe); dst via a Knuth
    // multiplicative scramble, self-loops shifted off
    def graph(scale: Int): (DataFrame, DataFrame) = {
      val n = 100000L * scale
      val e = spark.range(0, n * 10).select(
        ($"id" / 10).cast("long").as("src"),
        pmod($"id" * 2654435761L + 977L, lit(n)).as("dst"))
        .select($"src",
          when($"dst" === $"src", pmod($"dst" + 1L, lit(n)))
            .otherwise($"dst").as("dst"))
      val seeds = spark.range(0, 100).select($"id".as("node"))
      (e, seeds)
    }

    for (scale <- Seq(1, 3, 10)) {
      val (e, seeds) = graph(scale)
      val ec = e.localCheckpoint()
      time(s"hits x$scale (3 iters)") {
        graft.ops.Graphs.hits(ec, iters = 3)
      }
      time(s"ppr x$scale (4 iters)") {
        graft.ops.Graphs.personalizedPageRank(ec, seeds, iters = 4,
          skipSinkCheck = true)
      }
      time(s"cheapest x$scale (4 hops)") {
        graft.ops.Graphs.cheapestPaths(
          ec.withColumn("w", lit(1L) + pmod($"dst", lit(9L))),
          seeds, maxHops = 4)
      }
    }
    spark.stop()
  }
}
