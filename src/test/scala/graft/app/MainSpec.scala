package graft.app

import java.nio.file.Files
import graft.SparkSpec

/** End-to-end smoke of the pipeline entry point: one call, fixture
  * goldens asserted at every stage (the counts the oracle gate proves
  * for q40/q41/q45/q46 individually must survive composition).
  */
class MainSpec extends SparkSpec {

  test("pipeline runs end-to-end and reproduces the fixture goldens") {
    val out = Files.createTempDirectory("graft_pipeline_spec").toString
    val r = Main.run(spark, out)
    assert(r.ingested === 1502L)
    assert(r.valid === 1502L)       // fixture has no failed extractions
    assert(r.canonical === 1490L)   // 6 keys x 3 copies deduped
    assert(r.kpiRecipes > 0L)
    assert(Set("Très facile", "Facile", "Moyen", "Difficile")
      .contains(r.kpiTopDifficulty))
    assert(r.classicHits === 214L)  // q45 golden
    assert(r.frigoHits === 500L)    // q46 golden (500-cap)
    assert(r.classicTopId.nonEmpty)
    // the served ranking is the BM25 one (q80's path): the reported
    // winner must equal bm25Classic's rank-1 row on the same view
    val bm25Top = graft.search.Search.bm25Classic(
        spark.read.parquet(s"$out/search_view"), "chocolat")
      .head().getAs[String]("product_id")
    assert(r.classicTopId === bm25Top)
    // the persisted outputs exist and are readable
    assert(spark.read.parquet(s"$out/canonical").count() === 1490L)
    val view = spark.read.parquet(s"$out/search_view")
    assert(view.columns.contains("ingredients_text"))
    assert(view.count() === 1490L)
  }
}
