package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextAnalysis

class NativeSpec extends SparkSpec {
  import spark.implicits._

  test("HammingDistance: codegen and interpreted eval agree with the composed form") {
    val d = Seq(
      ("1010", "1110"), ("0000", "1111"), ("", ""),
      ("101", "1010"), ("abcdef", "abcxef")).toDF("a", "b")
    val native = d.select(Native.hamming($"a", $"b")).as[Long].collect().toSeq
    assert(native === Seq(1L, 4L, 0L, 1L, 1L))
    // equal-length ASCII inputs: identical to the composed Column form
    val eq = d.filter(length($"a") === length($"b"))
    val composed = eq.select(TextAnalysis.hamming($"a", $"b", 6))
      .as[Long].collect().toSeq
    val nat = eq.select(Native.hamming($"a", $"b")).as[Long].collect().toSeq
    assert(nat === composed)
    // interpreted path (no codegen) must agree
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("1010"),
      org.apache.spark.unsafe.types.UTF8String.fromString("1110"))
    val expr = org.apache.spark.sql.graftnative.HammingDistance(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.StringType, nullable = true))
    assert(expr.eval(row) === 1L)
  }

  test("LevenshteinThresholdRule rewrites bounded comparisons, same results") {
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    val df = Seq(("kitten", "sitting"), ("abc", "abd"), ("x", "zzzzz"))
      .toDF("a", "b").filter(levenshtein($"a", $"b") <= 2)
    val before = df.queryExecution.analyzed
    val after = org.apache.spark.sql.graftnative.LevenshteinThresholdRule(before)
    val hasThreshold = after.expressions.exists(_.exists {
      case Levenshtein(_, _, Some(_)) => true
      case _ => false
    })
    assert(hasThreshold, s"rule did not rewrite:\n$after")
    // idempotent: a second application changes nothing
    assert(org.apache.spark.sql.graftnative.LevenshteinThresholdRule(after)
      .fastEquals(after))
    // bounded and unbounded forms agree
    val unbounded = Seq(("kitten", "sitting"), ("abc", "abd"), ("x", "zzzzz"))
      .toDF("a", "b")
      .select(($"a" === $"a") && (levenshtein($"a", $"b") <= 2))
      .as[Boolean].collect().toSeq
    val bounded = Seq(("kitten", "sitting"), ("abc", "abd"), ("x", "zzzzz"))
      .toDF("a", "b")
      .select(levenshtein($"a", $"b", 2) >= 0)
      .as[Boolean].collect().toSeq
    assert(unbounded === bounded)
  }

  test("GraftExtensions registers graft_hamming for SQL use") {
    // the extensions object accepts the injection without error
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // and the same builder registered on a session resolves in SQL
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hamming"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.graftnative.HammingDistance].getName, "graft_hamming"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.graftnative.HammingDistance(children.head, children(1)))
    val got = s2.sql("SELECT graft_hamming('1010', '1110') AS d")
      .collect().head.getLong(0)
    assert(got === 1L)
  }
}
