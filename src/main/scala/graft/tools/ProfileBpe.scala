package graft.tools

import graft.Tables
import graft.ops.TextAnalysis

/** Measured BPE cost model (VERDICT r11 Next #3: "a PROFILE paragraph
  * for the BPE round cost (nMerges × type-table pass) with a measured
  * number"). Times the one corpus-sized pass (word-type frequencies)
  * separately from the per-round type-table cost by training at two
  * merge counts, and times the APPLY pass (the half that runs over
  * 100 TB) alone with a pre-trained merge table. Scratch tool, not
  * part of the library surface.
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    def time[A](name: String, runs: Int)(f: => A): Double = {
      f // warm
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val s = ts.sorted
      println(f"[bpe] $name%-22s min ${s.head}%.3f  med ${s(s.size / 2)}%.3f" +
        f"  runs ${ts.map(t => f"$t%.2f").mkString(",")}")
      s.head
    }

    // training is driver-loop-driven: the collect()s inside ARE the
    // actions, so timing the call times the jobs
    val t1 = time("train nMerges=1", 3) {
      TextAnalysis.bpeTrain(docs, "text", nMerges = 1).collect()
    }
    val t10 = time("train nMerges=10", 3) {
      TextAnalysis.bpeTrain(docs, "text", nMerges = 10).collect()
    }
    println(f"[bpe] per-round type-table cost ≈ ${(t10 - t1) / 9}%.3f s " +
      "(train10 - train1) / 9; train1 ≈ corpus pass + 1 round")

    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 10)
    merges.cache().count()
    time("segment (apply)", 5) {
      TextAnalysis.bpeSegment(docs, "doc_id", "text", merges)
        .write.mode("overwrite").format("noop").save()
    }
    time("segment native", 5) {
      TextAnalysis.bpeSegment(docs, "doc_id", "text", merges, native = true)
        .write.mode("overwrite").format("noop").save()
    }

    // the apply-cost story at a REALISTIC merge-table size: the
    // composed chain folds one replace per rank into the plan
    // (O(nMerges) string rebuilds per token occurrence); the native
    // expression pays one symbol-array scan per rank, allocation only
    // on hit. Train once (driver-loop cost, excluded), time apply.
    val merges100 = TextAnalysis.bpeTrain(docs, "text", nMerges = 100)
    merges100.cache().count()
    time("segment 100-merge", 5) {
      TextAnalysis.bpeSegment(docs, "doc_id", "text", merges100)
        .write.mode("overwrite").format("noop").save()
    }
    time("segment 100 native", 5) {
      TextAnalysis.bpeSegment(docs, "doc_id", "text", merges100,
          native = true)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
