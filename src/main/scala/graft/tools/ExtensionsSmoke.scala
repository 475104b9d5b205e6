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
    // the full native-function surface resolves through the same path
    val sh = spark.sql(
      "SELECT graft_shingles(array('a','b','c'), 2) AS s, " +
        "graft_min_md5(array('x')) AS m, " +
        "graft_simhash(array(md5('x')), 8) AS f, " +
        "graft_qdot(array(2L, 3L), array(4L, 5L)) AS q, " +
        "graft_minhash_band_keys(array('a b'), 2, 2) AS bk").head()
    assert(sh.getSeq[String](0) == Seq("a b", "b c"), "graft_shingles")
    assert(sh.getLong(3) == 23L, "graft_qdot")
    assert(sh.getSeq[String](4).length == 2, "graft_minhash_band_keys")
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
