package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.StreamingUpsert

/** Per-batch maintenance cost of the two incremental LSH forms as
  * accumulated state grows (the round-7 redesign's measurement):
  * prefeed K batches of state, then time ONE more batch through
  * [[StreamingUpsert.nearDupBatch]] (full-state distinct + union
  * self-join per batch) vs [[StreamingUpsert.nearDupBatchCompacted]]
  * (broadcast-new-vs-asset-table joins + additive population stats,
  * compacted once after prefeed). Scratch tool.
  */
object ProfileLshIncr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").localCheckpoint()
    val nDocs = docs.count()
    // rotated-copy corpus growth, as in ScaleSoakIndex
    def copyK(k: Int) = docs.select(
      ($"doc_id" + lit(k * 10000000L)).as("doc_id"),
      concat_ws(" ", slice(split($"text", " "), 1 + (7 * k) % 20, 10000),
        slice(split($"text", " "), lit(1), lit(1 + (7 * k) % 20) - 1))
        .as("text"))

    Seq(1, 3, 10).foreach { c =>
      val prefeed = (0 until c).map(copyK)
      val lastBatch = copyK(c) // the timed batch, same size every scale
      def clean(path: String, tables: String*): Unit = {
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(hp)) fs.delete(hp, true)
        tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
      // old form: prefeed c batches, time batch c+1
      val oldBase = s"/tmp/profile_lsh_incr/old_x$c"
      clean(oldBase)
      prefeed.zipWithIndex.foreach { case (b, i) =>
        StreamingUpsert.nearDupBatch(spark, b, "doc_id", "text",
          3, 4, 2, 0.5, oldBase)
      }
      val t0 = System.nanoTime()
      StreamingUpsert.nearDupBatch(spark, lastBatch, "doc_id", "text",
        3, 4, 2, 0.5, oldBase)
      println(f"[lsh-incr] old_batch_after_${c}x     ${(System.nanoTime() - t0) / 1e9}%8.3f s  (state = $c x $nDocs docs)")

      // compacted form: prefeed + compact, time the next batch
      val newBase = s"/tmp/profile_lsh_incr/new_x$c"
      val (setsT, bktT) = (s"plsh_sets_x$c", s"plsh_bkt_x$c")
      clean(newBase, setsT, bktT)
      prefeed.zipWithIndex.foreach { case (b, i) =>
        StreamingUpsert.nearDupBatchCompacted(spark, b, "doc_id", "text",
          3, 4, 2, 0.5, newBase, setsT, bktT, i.toLong)
      }
      StreamingUpsert.compactLshState(spark, newBase, setsT, bktT)
      val t1 = System.nanoTime()
      StreamingUpsert.nearDupBatchCompacted(spark, lastBatch, "doc_id",
        "text", 3, 4, 2, 0.5, newBase, setsT, bktT, c.toLong)
      println(f"[lsh-incr] compacted_batch_after_${c}x ${(System.nanoTime() - t1) / 1e9}%8.3f s")
      Seq(setsT, bktT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
    spark.stop()
  }
}
