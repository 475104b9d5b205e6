package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev smoke: evaluate every native expression under
  * spark.sql.codegen.factoryMode=CODEGEN_ONLY, which turns the silent
  * interpreted fallback into a hard failure — proving the generated
  * Java of each doGenCode actually compiles.
  */
object CodegenSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq((1L, "the cat sat on the mat the cat"),
      (2L, "le chat un deux trois quatre cinq six"),
      (3L, "")).toDF("doc_id", "text")
    val toks = graft.ops.TextAnalysis.toks(col("text"))
    docs.select(
      graft.plans.Native.distinctShingles(toks, 3).as("sh"),
      graft.plans.Native.minhashBandKeys(
        graft.plans.Native.distinctShingles(toks, 3), 4, 2).as("bk"),
      graft.plans.Native.simhash(transform(toks, t => md5(t)), 64).as("fp"),
      graft.plans.Native.minMd5(
        graft.plans.Native.distinctShingles(toks, 5)).as("mm"),
      graft.ops.TextAnalysis.textStats(toks).as("st"))
      .collect().foreach(_ => ())
    Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(4L, 5L, 6L))).toDF("id", "qv")
      .select(
        graft.plans.Native.qdot(col("qv"), col("qv")).as("d"),
        graft.plans.Native.signBucket(col("qv"), 4, 3).as("b"),
        graft.plans.Native.hamming(lit("1010"), lit("1110")).as("h"))
      .collect().foreach(_ => ())
    println("[codegen-smoke] all native expressions compiled under CODEGEN_ONLY")
    spark.stop()
  }
}
