package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 second-wave scaling soak: the session's new families at
  * 1x/3x/10x.
  *
  *  1. Audio energy-hash near-dup (q218): synthetic 130-sample PCM16
  *     WAV corpora with a planted 10% gain-halved duplicate rate —
  *     times the map-only decode+fingerprint pass and the banded
  *     Hamming pair join + CC separately. Expectation: both
  *     near-linear (the image-dHash result should transfer: same
  *     chain, different codec).
  *  2. Frame-set Jaccard (q222's clip join, codec factored out): n
  *     clips × 6 frame hashes with 10% planted near-dups sharing 4
  *     of 6 — times setJaccardPairs alone. Expectation: near-linear
  *     (inverted index + df cap; pair volume planted-dup-bounded).
  *  3. Distribution-match scoring (q224): n docs × ~40 tokens from a
  *     10k-word vocabulary, target = a 10% slice. Expectation:
  *     near-linear (two nBuckets-bounded rate passes + one explode
  *     into a broadcast join + one doc-key aggregate).
  */
object ScaleSoakR13b {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[soak-r13b] $name%-34s $s%8.3f s")
      s
    }
    def timeDf(name: String)(f: => DataFrame): Double =
      time(name)(f.write.mode("overwrite").format("noop").save())

    // ---- 1. audio energy-hash near-dup -------------------------------
    // 130 even samples per clip; in each group of 10, clip 9 is the
    // gain-halved copy of clip 0 (fingerprint-identical), the rest
    // distinct pseudo-random envelopes
    def wavs(n: Long): DataFrame =
      spark.range(0, n).as[Long].map { i =>
        val grp = (i / 10) * 10
        val dup = i % 10 == 9
        val s = if (dup) grp else i
        val base = (0 until 130).map { t =>
          2 * ((((t.toLong * (7 + 3 * (s % 23)) * 2029L + (s % 17 + 1) * 991L +
            t.toLong * t * (11 + (s % 13))) % 3001L).toInt) - 1500)
        }
        (i, graft.ops.Media.encodeWavPcm16(
          if (dup) base.map(_ / 2) else base))
      }.toDF("doc_id", "bin")

    for (n <- Seq(6000L, 18000L, 60000L)) {
      val corpus = wavs(n).localCheckpoint()
      val fpT = timeDf(s"audio fingerprint n=$n") {
        graft.ops.Media.energyHashWav(corpus, "doc_id", "bin")
      }
      val fps = graft.ops.Media.energyHashWav(corpus, "doc_id", "bin")
        .filter($"ok").select($"id".as("doc_id"), $"fp").localCheckpoint()
      val prT = timeDf(s"audio hamming pairs+cc n=$n") {
        graft.ops.Dedup.duplicateClusters(
          graft.ops.Dedup.hammingPairs(fps, maxDist = 6)
            .select($"doc_a", $"doc_b"))
      }
      println(f"[soak-r13b] audio n=$n fingerprint=$fpT%.2f pairs+cc=$prT%.2f")
    }

    // ---- 2. frame-set Jaccard ----------------------------------------
    // 6 hashes per clip; in each group of 10, clip 9 shares 4 of 6
    // with clip 0 -> jac 4/8 = 500000 ppm (kept at tau 450000)
    def clipSets(n: Long): DataFrame =
      spark.range(0, n).as[Long].map { i =>
        val grp = (i / 10) * 10
        val dup = i % 10 == 9
        val s = if (dup) grp else i
        val own = (0 until 6).map(f => s"h${s}_$f")
        val shs = if (dup) own.take(2) ++ (0 until 4).map(f => s"h${grp}_$f")
                  else own
        (i, shs)
      }.toDF("doc_id", "shs")

    for (n <- Seq(20000L, 60000L, 200000L)) {
      val sets = clipSets(n).localCheckpoint()
      val t = timeDf(s"setJaccardPairs n=$n") {
        graft.ops.Dedup.setJaccardPairs(sets, tauPpm = 450000L, maxDf = 10L)
      }
      println(f"[soak-r13b] setjac n=$n pairs=$t%.2f")
    }

    // ---- 3. distribution-match scoring -------------------------------
    def docs(n: Long): DataFrame =
      spark.range(0, n).as[Long].map { i =>
        val toks = (0 until 40).map { t =>
          val w = (i * 37 + t * 101 + i % 7 * t) % 10000
          s"w$w"
        }
        (i, toks.mkString(" "), if (i % 10 == 0) "en" else "xx")
      }.toDF("doc_id", "text", "lang")

    for (n <- Seq(20000L, 60000L, 200000L)) {
      val d = docs(n).localCheckpoint()
      val t = timeDf(s"distributionMatchScore n=$n") {
        graft.ops.TextAnalysis.distributionMatchScore(d, "doc_id", "text",
          d.filter($"lang" === "en"), "text", nBuckets = 1024)
      }
      println(f"[soak-r13b] match n=$n score=$t%.2f")
    }

    spark.stop()
  }
}
