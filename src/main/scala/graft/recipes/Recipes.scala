package graft
package recipes

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns._
import graft.ops.Dedup

/** The reference's recipe data model and ingest-normalization chain
  * (SURVEY.md §1, §2.1, §2.7), rebuilt as pure Column expressions — no
  * UDFs, so every normalizer stays inside whole-stage codegen and is
  * pushdown/prune-transparent.
  *
  * Reference semantics reproduced (all cited into /root/reference/):
  *  - F1  product_id = md5(url)                 scraper/main.py:139
  *  - F3  ordered difficulty classifier          scraper/main.py:167-182
  *  - F4  duration parser (h*60+min, fallbacks)  scraper/main.py:185-203
  *  - F5  first-number extractor                 scraper/main.py:210-214
  *  - F6  French-decimal rating parser           scraper/main.py:216-220
  *  - F10 image placeholder fallback             scraper/main.py:151-164
  *  - F12 derived search-view text columns       scraper/main.py:275-276
  *  - D2/S4 keyed last-write-wins dedup          scraper/main.py:263,277
  *  - S2/S3 JSON backup sink/source              scraper/main.py:253-259,
  *                                               restore_data.py:20-27
  *  - S5  truncate-and-load (duplicates kept)    restore_data.py:31-33
  *
  * Scale posture: the fixture is 1,502 rows, but every function here is
  * a per-row column expression or a single keyed window/aggregate — the
  * same plans run unchanged on a partitioned 100 TB corpus (the JSON
  * ingest would switch from one multiLine file to partitioned JSONL,
  * which [[readBackupJsonl]] already handles).
  */
/** Typed recipe record (SURVEY.md §1.4) — field names and types mirror
  * [[Recipes.schema]] exactly (updated_at stays the reference's string
  * timestamp form at rest; parse on demand). nullable fields use
  * Option where the fixture actually contains nulls.
  */
case class Recipe(
    product_id: String, name: String, category: String, url: String,
    image_url: String, difficulty: String, rating: Double,
    reviews_count: Long, duration_min: Long,
    ingredients: Seq[String], steps: Seq[String], updated_at: String)

object Recipes {

  /** Default fixture path (the reference's committed backup dataset). */
  val jsonPath = "/root/reference/marmiton_data.json"

  /** Explicit recipe schema (SURVEY.md §1.3 — pinned, never inferred). */
  val schema: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("name", StringType),
    StructField("category", StringType),
    StructField("url", StringType),
    StructField("image_url", StringType),
    StructField("difficulty", StringType),
    StructField("rating", DoubleType),
    StructField("reviews_count", LongType),
    StructField("duration_min", LongType),
    StructField("ingredients", ArrayType(StringType, containsNull = false)),
    StructField("steps", ArrayType(StringType, containsNull = false)),
    StructField("updated_at", StringType)))

  // ------------------------------------------------------------- sources
  /** S3: load the array-of-objects JSON backup (duplicates retained —
    * restore_data.py:20-27 insert_many semantics).
    */
  def loadRaw(spark: SparkSession, path: String = jsonPath): DataFrame =
    spark.read.option("multiLine", value = true).schema(schema).json(path)

  /** S3 at scale: partitioned JSONL form of the same backup. */
  def readBackupJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Typed view of the recipe table (SURVEY.md §1.4): the case-class
    * encoder mirrors [[schema]] field-for-field, so `as[Recipe]` is a
    * zero-copy re-interpretation — use it where compile-time field
    * safety helps (library consumers, Dataset transforms); the Column
    * API on the DataFrame remains the codegen-friendly hot path.
    */
  def typed(df: org.apache.spark.sql.DataFrame)
           (implicit spark: SparkSession): org.apache.spark.sql.Dataset[Recipe] = {
    import spark.implicits._
    df.as[Recipe]
  }

  // --------------------------------------------------------------- sinks
  /** S2: JSON backup sink (JSONL; Spark writes UTF-8, matching the
    * reference's ensure_ascii=False). coalesce(1) mirrors the single
    * backup file at fixture scale — drop it for a partitioned corpus.
    */
  def writeBackupJson(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)

  /** S2 at scale: PARTITIONED JSONL backup — the multi-part form a
    * 100 TB corpus actually writes (no single-writer coalesce);
    * [[readBackupJsonl]] reads it back. Round-trip proven through the
    * oracle gate by q68.
    */
  def writeBackupJsonParts(df: DataFrame, path: String, parts: Int): Unit =
    df.repartition(parts).write.mode("overwrite").json(path)

  /** S2 fixture-parity form: one pretty-ish JSON ARRAY file, like the
    * reference's json.dump of the full record list
    * (scraper/main.py:253-259). Collects to the driver by design —
    * the array-file format itself is single-writer; use
    * [[writeBackupJson]] (JSONL, distributed) for anything beyond
    * fixture scale.
    */
  def writeBackupJsonArray(df: DataFrame, file: String): Unit = {
    val rows = df.toJSON.collect()
    val body = rows.mkString("[\n", ",\n", "\n]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(file), body)
  }

  /** S5: truncate-and-load — full overwrite, duplicates retained
    * (restore_data.py:31-33).
    */
  def truncateAndLoad(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S6+S7: (re)write the derived search view — the ES-index analog
    * (drop/create + per-key doc write == deduped overwrite).
    */
  def writeSearchView(df: DataFrame, path: String): Unit =
    searchView(dedupByKey(df)).write.mode("overwrite").parquet(path)

  // ------------------------------------------------------ normalization
  /** F3: ordered difficulty classifier. The reference scans header
    * items IN ORDER and classifies on the FIRST item containing any
    * difficulty keyword, with intra-item priority "très facile" >
    * "facile" > "difficile" > "moyen" (scraper/main.py:167-182 — the
    * loop breaks on the first hit item). `infos` must already be
    * lowercased items (the reference lowercases at extraction).
    */
  def classifyDifficulty(infos: Column): Column = {
    val kws = Seq("très facile", "facile", "difficile", "moyen")
    // get() is 0-based and null-on-missing (element_at throws under ANSI
    // when the filter yields an empty array — i.e. no item has a keyword)
    val hit = get(
      filter(infos, i => kws.map(k => i.contains(k)).reduce(_ || _)), lit(0))
    when(hit.isNull, "Moyen")
      .when(hit.contains("très facile"), "Très facile")
      .when(hit.contains("facile"), "Facile")
      .when(hit.contains("difficile"), "Difficile")
      .otherwise("Moyen")
  }

  /** F4: duration parser over a raw header string. Mirrors
    * scraper/main.py:185-203: lowercase, "heure"->"h", then
    * hours = first (\d+)\s*h match (x60), plus minutes = first
    * (\d+)\s*min match; when neither an hours- nor a minutes-match
    * exists, fall back to `temps\s*[:\s]\s*(\d+)\s*m`. regexp_extract
    * returns "" on miss, so every cast is nullif-guarded to reproduce
    * Python's except->0 (SURVEY.md §7 risk 5). The page-text fallback
    * (main.py:188-189) is `parseDurationWithFallback` below.
    */
  def parseDurationMin(raw: Column): Column = {
    val header = regexp_replace(lower(raw), "heure", "h")
    val hStr = regexp_extract(header, "(\\d+)\\s*h", 1)
    val mStr = regexp_extract(header, "(\\d+)\\s*min", 1)
    val shortStr = regexp_extract(header, "temps\\s*[:\\s]\\s*(\\d+)\\s*m", 1)
    val h = coalesce(nullif(hStr, lit("")).cast("long"), lit(0L))
    val mins = when(mStr =!= "", mStr.cast("long"))
      .when(hStr === "", coalesce(nullif(shortStr, lit("")).cast("long"), lit(0L)))
      .otherwise(lit(0L))
    h * 60 + mins
  }

  /** F4+F14 composed: the reference's header-vs-page-text decision
    * (scraper/main.py:188-189) — when the joined info header contains
    * no digit, the duration is parsed from the first 1000 characters
    * of the page text instead (truncate FIRST, then parse: a number
    * past char 1000 must not be seen).
    */
  def parseDurationWithFallback(header: Column, pageText: Column): Column =
    when(hasDigit(header), parseDurationMin(header))
      .otherwise(parseDurationMin(substring(pageText, 1, 1000)))

  /** F5: first number in a string, 0 when none (scraper/main.py:210-214). */
  def firstNumber(raw: Column): Column =
    coalesce(nullif(regexp_extract(raw, "(\\d+)", 1), lit("")).cast("long"),
      lit(0L))

  /** F6: French-decimal rating parser: "4,8/5" -> 4.8, failure -> 0.0
    * (scraper/main.py:216-220). The numeric-shape guard replaces
    * Python's try/except (and keeps the cast legal under ANSI mode);
    * documented deviation: plain decimals only, no exponent forms.
    */
  def parseRating(raw: Column): Column = {
    val cleaned = regexp_replace(regexp_replace(trim(raw), "/5", ""), ",", ".")
    when(cleaned.rlike("^[0-9]+(\\.[0-9]+)?$"), cleaned.cast("double"))
      .otherwise(lit(0.0))
  }

  /** F2: whitespace-normalized text — the post-parse equivalent of the
    * reference's `get_text(" ", strip=True)` (scraper/main.py:145-148).
    */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** F11: formatted current timestamp, the reference's `updated_at`
    * stamp format (scraper/main.py:234). Non-deterministic by nature —
    * excluded from oracle queries, exercised in tests.
    */
  def nowFormatted(): Column =
    date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss")

  /** F14: contains-any-digit test (scraper/main.py:188) — the header
    * vs page-text fallback decision for F4.
    */
  def hasDigit(c: Column): Column = c.rlike("\\d")

  /** P4: image-URL blocklist (scraper/main.py:155-162). */
  val imageBlocklist: Seq[String] =
    Seq("placeholder", "logo", "default", "no-photo", "p_global_en_tete")

  /** F10: the fixed placeholder the reference substitutes (main.py:163-164). */
  val placeholderImage: String =
    "https://images.unsplash.com/photo-1546069901-ba9599a7e63c?q=80&w=800&auto=format&fit=crop"

  def isBadImage(url: Column): Column =
    url.isNull || url === "" ||
      imageBlocklist.map(w => lower(url).contains(w)).reduce(_ || _)

  def withImageFallback(url: Column): Column =
    when(isBadImage(url), lit(placeholderImage)).otherwise(url)

  /** P3 (scraper/main.py:140-142): drop records whose title extraction
    * failed — the reference skips them with `continue`.
    */
  def validRecipes(df: DataFrame): DataFrame =
    df.filter(col("name").isNotNull && col("name") =!= "Recette Inconnue")

  // ------------------------------------------------------------- views
  /** D2/S4: keyed last-write-wins view — the Mongo-upsert / ES-doc-id
    * final state. Latest `updated_at` wins; ties broken by category
    * desc (deterministic; on the fixture the three category scrapes
    * have strictly increasing timestamps, so the keeper matches the
    * reference's real final Mongo state: the last-scraped copy).
    */
  def dedupByKey(df: DataFrame): DataFrame =
    Dedup.lastWriteWins(df, "product_id", "updated_at", "category")

  /** F12/S6: derived search view with the ES text columns. */
  def searchView(df: DataFrame): DataFrame =
    df.withColumn("ingredients_text", array_join(col("ingredients"), ", "))
      .withColumn("steps_text", array_join(col("steps"), " "))

  // --------------------------------------------------------------- KPIs
  /** A1–A4 + P1 (app/main.py:41-57): KPI row over selected categories.
    * avg uses exact-decimal accumulation (engine convention, Fns.davg);
    * "Temps Moyen" truncates toward zero like Python int(); the mode
    * uses the explicit count-desc/value-asc form for pandas-`mode()[0]`
    * tie-break parity (SURVEY.md §2.5 A3).
    */
  def kpis(df: DataFrame, cats: Seq[String]): DataFrame = {
    val f = df.filter(col("category").isin(cats: _*))
    val kpi = f.agg(
      count(lit(1)).as("n_recipes"),
      davg(col("rating")).as("avg_rating"),
      davg(col("duration_min")).cast("long").as("avg_duration_min_int"))
    val mode = f.groupBy(col("difficulty")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("difficulty").asc)
      .limit(1)
      .select(col("difficulty").as("top_difficulty"))
    kpi.join(mode, lit(true), "left")
  }

  /** A5/A6 (app/main.py:61,65): value_counts over a column. */
  def valueCounts(df: DataFrame, c: String, cats: Seq[String]): DataFrame =
    df.filter(col("category").isin(cats: _*))
      .groupBy(col(c)).agg(count(lit(1)).as("n"))
}
