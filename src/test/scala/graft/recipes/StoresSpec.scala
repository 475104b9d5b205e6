package graft.recipes

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sink/source semantics (SURVEY.md §2.1 S2/S3/S5/S6/S7) + the small
  * scalar helpers (F2/F11/F14).
  */
class StoresSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("S2/S3: JSON backup round-trips all rows and fields") {
    val raw = Recipes.loadRaw(spark)
    val path = tmp("backup") + "/backup_json"
    Recipes.writeBackupJson(raw, path)
    val back = Recipes.readBackupJsonl(spark, path)
    assert(back.count() === 1502L)
    assert(raw.select("product_id", "category", "rating", "duration_min")
      .except(back.select("product_id", "category", "rating", "duration_min"))
      .count() === 0L)
    // array fields survive
    val a = back.filter($"product_id".isNotNull)
      .select(size($"ingredients")).as[Int].collect()
    assert(a.forall(_ >= 1))
  }

  test("S2 array form: JSON array file round-trips through the multiLine reader") {
    val sub = Recipes.dedupByKey(Recipes.loadRaw(spark)).limit(50)
    val file = tmp("backup_arr") + "/backup.json"
    Recipes.writeBackupJsonArray(sub, file)
    val back = Recipes.loadRaw(spark, file) // same reader as the fixture
    assert(back.count() === 50L)
    assert(sub.select("product_id", "rating")
      .except(back.select("product_id", "rating")).count() === 0L)
  }

  test("canonical table is format-pluggable: ORC round-trips the full schema") {
    // the columnar-at-rest choice is parquet, but nothing in the
    // engine depends on it — the pinned schema (incl. both string
    // arrays) survives an ORC round-trip bit-for-bit
    val df = Recipes.loadRaw(spark)
    val path = tmp("orc_canonical") + "/t"
    df.write.mode("overwrite").orc(path)
    val back = spark.read.schema(Recipes.schema).orc(path)
    assert(back.count() === 1502L)
    assert(back.schema === df.schema)
    assert(df.exceptAll(back).isEmpty && back.exceptAll(df).isEmpty)
  }

  test("S5: truncate-and-load retains duplicates; S6/S7 search view dedups") {
    val raw = Recipes.loadRaw(spark)
    val rawPath = tmp("s5") + "/raw_table"
    Recipes.truncateAndLoad(raw, rawPath)
    assert(spark.read.parquet(rawPath).count() === 1502L) // dupes kept
    Recipes.truncateAndLoad(raw, rawPath) // destructive re-load, same state
    assert(spark.read.parquet(rawPath).count() === 1502L)

    val viewPath = tmp("s6") + "/search_view"
    Recipes.writeSearchView(raw, viewPath)
    val view = spark.read.parquet(viewPath)
    assert(view.count() === 1490L) // per-key overwrite semantics
    assert(view.columns.contains("ingredients_text"))
    assert(view.columns.contains("steps_text"))
  }

  test("F2: whitespace normalization") {
    val got = Seq("  a \t b\n\nc  ", "x").toDF("t")
      .select(Recipes.normalizeWhitespace($"t")).as[String].collect().toSeq
    assert(got === Seq("a b c", "x"))
  }

  test("F11: formatted now matches the reference's stamp format") {
    val got = Seq(1).toDF("x").select(Recipes.nowFormatted()).as[String].head()
    assert(got.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"))
  }

  test("F14: contains-digit predicate") {
    val got = Seq("1 h 30", "pas de temps", "").toDF("t")
      .select(Recipes.hasDigit($"t")).as[Boolean].collect().toSeq
    assert(got === Seq(true, false, false))
  }
}
