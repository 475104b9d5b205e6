package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join profile: the bucketed equi-rewrite
  * (Ranges.bucketedIntervalOverlapJoin) vs the naive key-equality
  * theta join Spark plans as a per-key cross product, on synthetic
  * same-key interval sets; then the rewrite alone at 1x/3x/10x.
  * Intervals are 1–6 h long on a 30-day horizon over a small hot key
  * domain (the adversarial case for the theta form: few keys → big
  * per-key cross products).
  */
object ProfileOverlap {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val HourUs = 3600L * 1000000L
    val base = 1704067200000000L

    def mk(n: Long, pfx: String, keys: Int): DataFrame =
      spark.range(0, n).select(
        $"id".as(s"${pfx}_id"),
        concat(lit("k"), pmod($"id" * 2654435761L, lit(keys))).as(s"${pfx}k"),
        timestamp_micros(lit(base) +
          pmod($"id" * 40503L * 7919L, lit(30L * 24 * HourUs)))
          .as(s"${pfx}_start"))
        .withColumn(s"${pfx}_end",
          timestamp_micros(unix_micros(col(s"${pfx}_start")) +
            (lit(1L) + pmod(col(s"${pfx}_id") * 31L, lit(6L))) * HourUs))

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[overlap] $name%-38s $s%8.3f s")
      s
    }
    def timeDf(name: String)(f: => DataFrame): Double =
      time(name)(f.write.mode("overwrite").format("noop").save())

    // head-to-head over a HOT key domain (20 keys): the theta form's
    // per-key cross product is 20 x (25k x 5k) = 2.5e9 comparisons;
    // the rewrite's bucket join is overlap-bounded
    val l = mk(500000, "a", 20).localCheckpoint()
    val r = mk(100000, "w", 20).localCheckpoint()
    timeDf("bucketed rewrite 500k x 100k, 20 keys") {
      graft.ops.Ranges.bucketedIntervalOverlapJoin(l, r, "ak", "wk",
        "a_start", "a_end", "w_start", "w_end", HourUs)
    }
    timeDf("naive theta 500k x 100k, 20 keys") {
      l.join(r, $"ak" === $"wk" &&
        $"a_start" < $"w_end" && $"w_start" < $"a_end")
    }
    // rewrite scaling 1x/3x/10x (right side fixed)
    for (n <- Seq(500000L, 1500000L, 5000000L)) {
      val ln = mk(n, "a", 20).localCheckpoint()
      timeDf(s"bucketed rewrite n=$n x 100k") {
        graft.ops.Ranges.bucketedIntervalOverlapJoin(ln, r, "ak", "wk",
          "a_start", "a_end", "w_start", "w_end", HourUs)
      }
    }
    spark.stop()
  }
}
