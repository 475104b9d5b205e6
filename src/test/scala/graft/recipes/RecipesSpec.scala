package graft.recipes

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden-fixture tests over the reference's committed backup dataset
  * (SURVEY.md §5: 1,502 records / 1,490 distinct keys, 6 recipes
  * duplicated across all 3 categories).
  */
class RecipesSpec extends SparkSpec {
  import spark.implicits._

  lazy val raw = Recipes.loadRaw(spark).cache()
  lazy val dedup = Recipes.dedupByKey(raw).cache()

  test("fixture loads all 1502 records") {
    assert(raw.count() === 1502L)
  }

  test("typed Dataset[Recipe] view round-trips the fixture (§1.4)") {
    implicit val s = spark
    val ds = Recipes.typed(Recipes.loadRaw(spark))
    assert(ds.count() === 1502L)
    // typed field access works and agrees with the Column API
    val typedAvg = ds.map(_.rating).reduce(_ + _) / 1502.0
    val colAvg = Recipes.loadRaw(spark)
      .agg(sum($"rating") / 1502.0).as[Double].head()
    assert(math.abs(typedAvg - colAvg) < 1e-9)
    val r = ds.filter(_.product_id.nonEmpty).head()
    assert(r.product_id.length === 32)
    assert(r.ingredients.nonEmpty)
  }

  test("1490 distinct product ids; 6 keys duplicated exactly 3x") {
    assert(raw.select("product_id").distinct().count() === 1490L)
    val dupCounts = raw.groupBy("product_id").count()
      .filter($"count" > 1).select("count").as[Long].collect()
    assert(dupCounts.length === 6)
    assert(dupCounts.forall(_ === 3L))
  }

  test("keyed LWW dedup keeps 1490 rows and is idempotent (D2)") {
    assert(dedup.count() === 1490L)
    val again = Recipes.dedupByKey(dedup)
    assert(again.count() === 1490L)
    assert(dedup.select("product_id", "category")
      .except(again.select("product_id", "category")).count() === 0L)
  }

  test("LWW keeper is the last-scraped (dessert) copy for duplicated keys") {
    val dupIds = raw.groupBy("product_id").count().filter($"count" > 1)
      .select("product_id")
    val keeperCats = dedup.join(dupIds, "product_id")
      .select("category").as[String].collect()
    assert(keeperCats.length === 6)
    assert(keeperCats.forall(_ === "dessert"))
  }

  test("product_id = md5(url) holds fixture-wide (F1)") {
    assert(raw.filter(md5($"url") =!= $"product_id").count() === 0L)
  }

  test("dashboard KPI goldens for default category (A1-A4)") {
    val row = Recipes.kpis(dedup, Seq("plat-principal")).collect().head
    assert(row.getAs[Long]("n_recipes") === 495L)
    assert(row.getAs[Double]("avg_rating") === 4.755757575757576)
    assert(row.getAs[Long]("avg_duration_min_int") === 59L)
    assert(row.getAs[String]("top_difficulty") === "Très facile")
  }

  test("global difficulty mode over raw fixture is Très facile with 910 (A3)") {
    val vc = raw.groupBy("difficulty").count()
      .orderBy($"count".desc, $"difficulty".asc).collect()
    assert(vc.head.getString(0) === "Très facile")
    assert(vc.head.getLong(1) === 910L)
  }

  test("search view derives ES text columns (F12/S6)") {
    val v = Recipes.searchView(dedup)
    val r = v.filter(size($"ingredients") >= 2)
      .select($"ingredients", $"ingredients_text", $"steps", $"steps_text")
      .head()
    val ings = r.getSeq[String](0)
    assert(r.getString(1) === ings.mkString(", "))
    assert(r.getString(3) === r.getSeq[String](2).mkString(" "))
  }

  test("KPI row on empty selection still yields one row of nulls") {
    val row = Recipes.kpis(dedup, Seq("no-such-category")).collect()
    assert(row.length === 1)
    assert(row.head.getAs[Long]("n_recipes") === 0L)
    assert(row.head.isNullAt(row.head.fieldIndex("top_difficulty")))
  }
}
