package graft.ops

import graft.SparkSpec

class CleanCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("keepBestInCluster: score argmax per cluster, id tie, singletons kept") {
    val scored = Seq(
      (1L, 500L), (2L, 900L), (3L, 900L), // cluster A: 2 wins the 900
                                          // tie over 3 by id; 1 loses
      (4L, 100L),                         // cluster B alone in table
      (5L, 0L)                            // singleton (no cluster row)
    ).toDF("doc_id", "score_ppm")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster_id")
    val got = CleanCorpus.keepBestInCluster(scored, "doc_id",
        "score_ppm", clusters)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 1L), (4L, 4L), (5L, 5L)))
  }

  test("keepBestInCluster: keeps exactly one doc per cluster under shuffles") {
    val rnd = new scala.util.Random(7)
    val scored = (1L to 500L).map(i => (i, rnd.nextInt(100).toLong))
      .toDF("doc_id", "score_ppm").repartition(7)
    // clusters of 5 consecutive ids
    val clusters = (1L to 500L).map(i => (i, (i - 1) / 5 * 5 + 1))
      .toDF("doc_id", "cluster_id").repartition(3)
    val kept = CleanCorpus.keepBestInCluster(scored, "doc_id",
      "score_ppm", clusters).collect()
    assert(kept.length === 100)
    // every keeper is its cluster's (score desc, id asc) argmax
    val scoreOf = (1L to 500L).zip(scored.orderBy("doc_id")
      .select("score_ppm").as[Long].collect()).toMap
    kept.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val c = r.getAs[Long]("cluster_id")
      val members = (c until c + 5)
      val best = members.maxBy(m => (scoreOf(m), -m))
      assert(id === best, s"cluster $c kept $id, expected $best")
    }
  }

  test("multimodalNearDupClusters: routes by magic, clusters within modality, never across") {
    import org.apache.spark.sql.functions._
    def wavSamples(seed: Int): Seq[Int] =
      (0 until 130).map { t =>
        2 * ((((t.toLong * (7 + 3 * seed) * 2029L + (seed + 1) * 991L +
          t.toLong * t * (11 + seed)) % 3001L).toInt) - 1500)
      }
    def pat(i: Int)(x: Int, y: Int): (Int, Int, Int) =
      (8 + ((x * (2 + i) + y * (3 + 2 * i)) * 7) % 180,
        8 + ((x * (5 + i) + y * (1 + i)) * 11) % 180,
        8 + ((x + y * (2 + i)) * 13) % 180)
    val pal = (0 until 128).map(k =>
      ((2 * k) % 180 + 8, (k * 5 + 17) % 180 + 8, (k * 11 + 3) % 180 + 8))
    def gif(shift: Int) = Media.encodeGifUncompressed(12, 10, pal.map {
        case (r, g, b) => (r + shift, g + shift, b + shift) },
      (0 until 3).map(f => Array.tabulate(120)(i =>
        ((i * (3 + f) + i * i * (1 + 2 * f)) % 128).toByte)))
    // one dup pair per modality + one singleton each
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today".getBytes("UTF-8")),
      (2L, "the quick brown fox jumps over the lazy dog today".getBytes("UTF-8")),
      (3L, "completely different words entirely unrelated content".getBytes("UTF-8")),
      (10L, Media.pngFixture(18, 16)(pat(0))),
      (11L, Media.pngFixture(18, 16) { (x, y) =>
        val (r, g, b) = pat(0)(x, y); (r + 16, g + 16, b + 16) }),
      (12L, Media.pngFixture(18, 16)(pat(3))),
      (20L, Media.encodeWavPcm16(wavSamples(0))),
      (21L, Media.encodeWavPcm16(wavSamples(0).map(_ / 2))),
      (22L, Media.encodeWavPcm16(wavSamples(3))),
      (30L, gif(0)),
      (31L, gif(16)),
      (40L, "GIF8 looks like a gif but is text and must cluster nowhere"
        .getBytes("UTF-8")), // routed to video, fails decode closed
      // IDENTICAL corrupt blobs: no magic, invalid UTF-8 (0xFE can
      // never open a UTF-8 sequence). The fail-closed unknown route
      // must keep this value-identical pair out of EVERY chain — the
      // old mojibake-text fallback simhashed them to distance 0
      (50L, Array[Byte](0xFE.toByte, 0x01, 0xC3.toByte, 0x28, 0x77)),
      (51L, Array[Byte](0xFE.toByte, 0x01, 0xC3.toByte, 0x28, 0x77)))
      .toDF("doc_id", "bin")
    val got = CleanCorpus.multimodalNearDupClusters(corpus)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 1L, true), (2L, 1L, false),     // text pair
      (10L, 10L, true), (11L, 10L, false), // image pair
      (20L, 20L, true), (21L, 20L, false), // audio pair
      (30L, 30L, true), (31L, 30L, false)) // video pair
      , "exactly the four within-modality pairs; singletons, the " +
        "GIF-prefixed text blob, and the corrupt unknown pair absent")
  }
}
