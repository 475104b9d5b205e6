package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.JoinReduce

/** Isolated profile for the q123 Bloom semi-join reduction: times the
  * reduced join against the identical UNREDUCED shuffle join and
  * reports shuffle records/bytes written by each, which is the thing
  * the reduction exists to shrink. Scratch tool, not library surface.
  */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // collect(), not a noop write: the write path builds its OWN
    // QueryExecution, leaving df.queryExecution unexecuted and every
    // metric zero. The aggregate output here is 5 rows.
    def shuffleWritten(df: DataFrame): (Long, Long) = {
      df.collect()
      PlanWalk.shuffleWritten(df)
    }

    def times(name: String, runs: Int)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[bloom] $name%-18s min ${ts.head}%.3f  med ${ts(ts.size / 2)}%.3f  max ${ts.last}%.3f")
    }

    val mBits = 1 << 16
    val k = 4
    val o = Tables.load(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit("1995-03-01").cast("timestamp") &&
        $"o_orderdate" < lit("1995-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_orderpriority")
    val li = Tables.load(spark, sfDir, "lineitem")

    def agg(j: DataFrame): DataFrame = j.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"))

    val plainJoin = agg(li.join(o.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey"))
    val words = JoinReduce.bloomWords(o, $"o_orderkey", mBits, k)
    val bloomJoin = agg(
      li.filter(JoinReduce.mightContain(words, mBits, k, $"l_orderkey"))
        .join(o.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey"))

    val (pr, pb) = shuffleWritten(plainJoin)
    val (br, bb) = shuffleWritten(bloomJoin)
    println(s"[bloom] plain join: shuffle rows=$pr bytes=$pb")
    println(s"[bloom] bloom join: shuffle rows=$br bytes=$bb")
    println(f"[bloom] reduction: rows ${100.0 * (pr - br) / math.max(pr, 1)}%.1f%%  " +
      f"bytes ${100.0 * (pb - bb) / math.max(pb, 1)}%.1f%%")
    times("plain_join", 7)(plainJoin)
    times("bloom_join", 7)(bloomJoin)
    spark.stop()
  }
}
