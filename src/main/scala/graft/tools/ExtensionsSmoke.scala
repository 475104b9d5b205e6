package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

/** Dev smoke: prove the spark.sql.extensions plug-in path end-to-end
  * in a fresh JVM — the injected SQL function resolves and the
  * levenshtein-threshold optimizer rule fires on ad-hoc SQL. (The unit
  * tests exercise both components directly; this exercises the
  * config-driven registration a cluster deployment uses.)
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    

    val d = spark.sql("SELECT graft_hamming('1010', '1110') AS d")
      .head().getLong(0)
    // over a file scan — a literal LocalRelation would be folded away
    // by ConvertToLocalRelation before the rule could be observed
    val df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .filter(expr("levenshtein(p_name, 'promo burnished') <= 2"))
    val rewritten = df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case org.apache.spark.sql.catalyst.expressions.Levenshtein(_, _, Some(_)) => true
      case _ => false
    })
    println(s"[extsmoke] graft_hamming=$d ruleRewrote=$rewritten")
    assert(d == 1L, "graft_hamming via spark.sql.extensions")
    assert(rewritten, "LevenshteinThresholdRule via spark.sql.extensions")
    spark.stop()
  }
}
