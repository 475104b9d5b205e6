package graft.recipes

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.SparkSpec

/** Property tests for the normalization chain (SURVEY.md §5.2): each
  * Column expression is checked against an independent Scala model of
  * the reference's Python semantics (scraper/main.py:167-220) over
  * generated inputs, evaluated in one DataFrame pass.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g)(Gen.Parameters.default, rng.Seed(42L)).get

  // ------------------------------------------------------- models (py)
  private def refDuration(raw: String): Long = {
    val header = raw.toLowerCase.replace("heure", "h")
    val hM = "(\\d+)\\s*h".r.findFirstMatchIn(header)
    val mM = "(\\d+)\\s*min".r.findFirstMatchIn(header)
    val sM = "temps\\s*[:\\s]\\s*(\\d+)\\s*m".r.findFirstMatchIn(header)
    val h = hM.map(_.group(1).toLong).getOrElse(0L)
    val m =
      if (mM.isDefined) mM.get.group(1).toLong
      else if (hM.isEmpty) sM.map(_.group(1).toLong).getOrElse(0L)
      else 0L
    h * 60 + m
  }

  private def refDifficulty(infos: Seq[String]): String =
    infos.collectFirst {
      case i if i.contains("très facile") => "Très facile"
      case i if i.contains("facile") => "Facile"
      case i if i.contains("difficile") => "Difficile"
      case i if i.contains("moyen") => "Moyen"
    }.getOrElse("Moyen")

  // --------------------------------------------------------------- F4
  test("F4 duration parser: h*60+m over generated hour/minute forms") {
    val gen = for {
      h <- Gen.choose(0, 12)
      m <- Gen.choose(0, 59)
      form <- Gen.oneOf(0, 1, 2, 3)
    } yield form match {
      case 0 => s"$h h $m min"
      case 1 => s"$h heure $m min"
      case 2 => s"${h}h$m"     // glued: no 'min' token -> minutes ignored
      case 3 => s"$m min"
    }
    val inputs = sample(gen, 120) ++ Seq(
      "1 h 30 min", "45 min", "1h30", "temps : 25 m", "temps  12 m",
      "2 heure", "préparation: 3 h", "aucun temps", "", "90 MIN",
      "Temps : 7 m", "1 h", "0 min")
    val got = inputs.toDF("raw")
      .select(Recipes.parseDurationMin($"raw")).as[Long].collect()
    inputs.zip(got).foreach { case (in, g) =>
      assert(g === refDuration(in), s"input: '$in'")
    }
  }

  // --------------------------------------------------------------- F3
  test("F3 difficulty classifier: first-hit-item order over generated infos") {
    val frag = Gen.oneOf("très facile", "facile", "difficile", "moyen",
      "20 min", "4 pers.", "bon marché", "plutôt difficile", "pas facile")
    val gen = Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, frag))
    val inputs = sample(gen, 100) ++ Seq(
      Seq("très facile"), Seq("facile"), Seq("difficile"), Seq("moyen"),
      Seq.empty[String], Seq("20 min", "très facile"),
      Seq("pas facile", "moyen"),        // "facile" inside "pas facile" wins
      Seq("plutôt difficile", "facile")) // first item decides
    val got = inputs.toDF("infos")
      .select(Recipes.classifyDifficulty($"infos")).as[String].collect()
    inputs.zip(got).foreach { case (in, g) =>
      assert(g === refDifficulty(in), s"input: $in")
    }
  }

  // --------------------------------------------------------------- F6
  test("F6 rating parser: comma-decimal forms and failure fallback") {
    val cases = Seq(
      "4,8/5" -> 4.8, "0,0/5" -> 0.0, " 4,5/5 " -> 4.5, "5/5" -> 5.0,
      "3,25/5" -> 3.25, "4.8/5" -> 4.8, "n/a" -> 0.0, "" -> 0.0,
      "abc" -> 0.0, ",5/5" -> 0.0)
    val got = cases.map(_._1).toDF("raw")
      .select(Recipes.parseRating($"raw")).as[Double].collect()
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g === want, s"input: '$in'")
    }
  }

  // --------------------------------------------------------------- F5
  test("F5 first-number extractor") {
    val cases = Seq("123 avis (456)" -> 123L, "avis: 7" -> 7L,
      "no digits" -> 0L, "" -> 0L, "00 x" -> 0L)
    val got = cases.map(_._1).toDF("raw")
      .select(Recipes.firstNumber($"raw")).as[Long].collect()
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g === want, s"input: '$in'")
    }
  }

  // -------------------------------------------------------------- F10
  test("F10 image fallback: blocklist + empty, case-insensitive") {
    val cases = Seq(
      "" -> true, "https://x/LOGO.png" -> true,
      "https://x/placeholder.jpg" -> true, "https://x/no-photo.png" -> true,
      "https://x/p_global_en_tete.jpg" -> true,
      "https://x/photo.jpg" -> false,
      Recipes.placeholderImage -> false) // idempotent on its own output
    val got = cases.map(_._1).toDF("u")
      .select(Recipes.withImageFallback($"u")).as[String].collect()
    cases.zip(got).foreach { case ((in, fall), g) =>
      if (fall) assert(g === Recipes.placeholderImage, s"input: '$in'")
      else assert(g === in, s"input: '$in'")
    }
  }

  // --------------------------------------------------------------- P3
  test("P3 validity filter drops null and 'Recette Inconnue' titles") {
    val df = Seq(
      (1L, "Tarte aux pommes"), (2L, "Recette Inconnue"), (3L, null))
      .toDF("id", "name")
    val kept = Recipes.validRecipes(df).select("id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  // --------------------------------------------------------- F4 + F14
  test("F4 page-text fallback: digit-free header reads page_text[:1000]") {
    val pad = "x " * 500 // 1000 digit-free chars
    val cases = Seq(
      // header has a digit -> page text ignored entirely
      ("facile - 45 min", "temps : 999 min", 45L),
      // no digit in header -> parsed from page text
      ("facile", "cuisson temps : 30 min", 30L),
      // duration past char 1000 -> truncated away -> 0
      ("facile", pad + "temps : 30 min", 0L),
      // neither side has a digit -> 0
      ("facile", "aucune duree ici", 0L))
    val got = cases.map(c => (c._1, c._2)).toDF("h", "p")
      .select(Recipes.parseDurationWithFallback($"h", $"p"))
      .as[Long].collect()
    cases.zip(got).foreach { case ((h, _, want), g) =>
      assert(g === want, s"header: '$h'")
    }
  }
}
