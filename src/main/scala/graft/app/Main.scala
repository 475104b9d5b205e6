package graft.app

import org.apache.spark.sql.SparkSession
import graft.recipes.Recipes
import graft.search.Search

/** End-to-end pipeline entry point — the engine-native restatement of
  * the reference's compose-up (docker-compose.yml:33-45: restore the
  * JSON backup into the store, index the search view, serve KPIs and
  * both searches):
  *
  *   ingest backup → validity filter → keyed LWW dedup →
  *   write canonical table + search view → KPI row → classic search +
  *   frigo search.
  *
  * One command:
  *   sbt "runMain graft.app.Main [outDir]"
  *
  * Every stage is one of the library's oracle-verified operators; this
  * object only composes them and reports counts (MainSpec asserts the
  * fixture goldens end-to-end).
  */
object Main {

  /** One run's observable outcome (asserted by MainSpec).
    * `classicTopId` is the BM25-ranked winner (the ranking the
    * reference's ES search actually serves); `classicHits` stays the
    * fuzzy hit-set cardinality (the q45 golden).
    */
  final case class Report(
      ingested: Long, valid: Long, canonical: Long,
      kpiRecipes: Long, kpiTopDifficulty: String,
      classicHits: Long, classicTopId: String,
      frigoHits: Long)

  def run(spark: SparkSession, outDir: String,
          jsonPath: String = Recipes.jsonPath): Report = {
    // S3: array-of-objects backup ingest, duplicates retained
    val raw = Recipes.loadRaw(spark, jsonPath)
    val ingested = raw.count()
    // P3: drop failed extractions (the reference's `continue`)
    val valid = Recipes.validRecipes(raw)
    val nValid = valid.count()
    // D2/S4: keyed last-write-wins — the upsert end state
    val canon = Recipes.dedupByKey(valid)
    // S5: canonical table (truncate-and-load) + S6/S7: search view
    Recipes.truncateAndLoad(canon, s"$outDir/canonical")
    Recipes.writeSearchView(valid, s"$outDir/search_view")
    val canonical = spark.read.parquet(s"$outDir/canonical").count()
    val view = spark.read.parquet(s"$outDir/search_view")
    // A1–A4: the dashboard KPI row for the default selection
    val kpi = Recipes.kpis(canon, Seq("plat-principal")).head()
    // Q1/Q6/Q7: classic multi_match search — the HIT SET from the
    // fuzzy hit-count form (q45's golden), the served RANKING from
    // the BM25 form (q80's path: what ES actually ranks with);
    // Q2–Q5: frigo search
    val classic = Search.classic(view, "chocolat").collect()
    val ranked = Search.bm25Classic(view, "chocolat").collect()
    val frigo = Search.frigo(view, "oeufs, farine, lait").collect()
    Report(
      ingested = ingested, valid = nValid, canonical = canonical,
      kpiRecipes = kpi.getAs[Long]("n_recipes"),
      kpiTopDifficulty = kpi.getAs[String]("top_difficulty"),
      classicHits = classic.length.toLong,
      classicTopId = if (ranked.isEmpty) ""
        else ranked.head.getAs[String]("product_id"),
      frigoHits = frigo.length.toLong)
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pipeline").toString)
    val spark = graft.LocalSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, outDir)
    println(s"[pipeline] out=$outDir")
    println(s"[pipeline] ingested=${r.ingested} valid=${r.valid} " +
      s"canonical=${r.canonical}")
    println(s"[pipeline] kpi: n_recipes=${r.kpiRecipes} " +
      s"top_difficulty=${r.kpiTopDifficulty}")
    println(s"[pipeline] search: classic(chocolat)=${r.classicHits} hits " +
      s"(top=${r.classicTopId}) frigo(oeufs,farine,lait)=${r.frigoHits} hits")
    spark.stop()
  }
}
