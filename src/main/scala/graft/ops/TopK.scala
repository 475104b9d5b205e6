package graft
package ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-key top-k as a MERGEABLE aggregate — the maintained/
  * serve form of "latest k per key".
  *
  * What Spark already solves (measured, pinned in TopKSpec/PlanSpec):
  * the ad-hoc window form `row_number() OVER (PARTITION BY key ORDER
  * BY ord DESC) <= k` does NOT shuffle the corpus on Spark 3.5+ —
  * `InferWindowGroupLimit` plans a partial WindowGroupLimit BELOW the
  * exchange, so each map task ships at most k rows per key (TopKSpec
  * measures 121 shuffle records where the unlimited window writes all
  * 20k). An ad-hoc top-k query should BE the window form; re-implementing
  * that truncation by hand would duplicate the optimizer.
  *
  * What Spark does not solve: the optimizer's truncation exists only
  * inside a single query. At 100 TB the top-k nobody can afford is the
  * one over years of history — the scale answer is the summary
  * discipline (q136/q145/q179): store per-segment (e.g. per-day)
  * bounded top-k PARTIALS once, and serve "top k per key over any
  * horizon" by MERGING partials — segment-count × keys × k rows
  * touched at serve time, never the corpus. That needs top-k to be a
  * mergeable aggregate, which is exactly the typed [[Aggregator]]
  * here: its buffer is the k best (ord DESC, id ASC) rows, reduce
  * inserts, merge is a k-bounded sorted merge — associative and
  * commutative over a total order (ids distinct), so the result is
  * partitioning- and segmentation-independent. [[topKPerKey]] gates
  * the aggregator against the window oracle (q186); [[serveTopK]]
  * over [[topKPartials]] is the maintained face, results-invisible vs
  * the batch form under ANY segmentation (q188, TopKSpec property).
  *
  * Execution note: the aggregator runs as ObjectHashAggregate
  * (object-typed, outside Tungsten codegen) with partial aggregation;
  * under memory pressure it falls back to sort-based aggregation but
  * KEEPS partial aggregation, so the k-bound on shuffle volume
  * survives the fallback. Rows with NULL ord/id are dropped up front
  * (a NULL can't rank); `ordCol`/`idCol` must be integral — exact, no
  * cross-engine float-ranking ambiguity.
  */
object TopK {

  /** Best-first total order: (ord DESC, id ASC). */
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Merge two best-first-sorted bounded lists, keep the k best. */
  private def mergeK(x: List[(Long, Long)], y: List[(Long, Long)],
                     k: Int): List[(Long, Long)] = {
    val out = List.newBuilder[(Long, Long)]
    var (a, b, n) = (x, y, 0)
    while (n < k && (a.nonEmpty || b.nonEmpty)) {
      if (b.isEmpty || (a.nonEmpty && !beats(b.head, a.head))) {
        out += a.head; a = a.tail
      } else { out += b.head; b = b.tail }
      n += 1
    }
    out.result()
  }

  /** The bounded top-k aggregator (see object doc for the contract). */
  private[graft] def topKAgg(k: Int): Aggregator[
      (Long, Long), List[(Long, Long)], Seq[(Long, Long)]] =
    new Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {
      def zero: List[(Long, Long)] = Nil
      def reduce(buf: List[(Long, Long)],
                 row: (Long, Long)): List[(Long, Long)] =
        mergeK(buf, row :: Nil, k)
      def merge(x: List[(Long, Long)],
                y: List[(Long, Long)]): List[(Long, Long)] =
        mergeK(x, y, k)
      def finish(buf: List[(Long, Long)]): Seq[(Long, Long)] = buf
      def bufferEncoder: Encoder[List[(Long, Long)]] =
        ExpressionEncoder[List[(Long, Long)]]()
      def outputEncoder: Encoder[Seq[(Long, Long)]] =
        ExpressionEncoder[Seq[(Long, Long)]]()
    }

  /** Rank a per-key array of (ord, id) entries into flat rows
    * (keyCols*, rank 1..k, id, ord).
    */
  private def explodeRanked(keyed: DataFrame, keyCols: Seq[String],
                            ordCol: String, idCol: String): DataFrame =
    keyed.select(keyCols.map(col) :+ posexplode(col("_top")): _*)
      .select(keyCols.map(col) ++ Seq(
        (col("pos") + 1L).as("rank"),
        col("col._2").as(idCol),
        col("col._1").as(ordCol)): _*)

  /** Per-key top-k rows by (`ordCol` DESC, `idCol` ASC): one output row
    * per kept input row — (keyCols*, rank 1..k, id, ord). Exactly the
    * window form's `rank <= k` result (q186 gates the equivalence).
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], ordCol: String,
                 idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(keyCols.nonEmpty, "at least one key column")
    val f = udaf(topKAgg(k))
    explodeRanked(
      df.filter(col(ordCol).isNotNull && col(idCol).isNotNull)
        .groupBy(keyCols.map(col): _*)
        .agg(f(col(ordCol).cast("long"), col(idCol).cast("long"))
          .as("_top")),
      keyCols, ordCol, idCol)
  }

  /** The STORED partial: per (`segmentCol`, keyCols*) bounded top-k
    * arrays — one row per segment × key, `_top` = the k best (ord, id)
    * entries of that segment. Computed once per segment (e.g. per
    * ingest day); corpus-sized input, partial-sized output.
    */
  def topKPartials(df: DataFrame, segmentCol: String, keyCols: Seq[String],
                   ordCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val f = udaf(topKAgg(k))
    df.filter(col(ordCol).isNotNull && col(idCol).isNotNull)
      .groupBy((segmentCol +: keyCols).map(col): _*)
      .agg(f(col(ordCol).cast("long"), col(idCol).cast("long")).as("_top"))
  }

  /** Serve per-key top-k from stored partials: re-aggregate the `_top`
    * arrays with the SAME merge (explode + re-fold — associativity
    * makes this equal the batch aggregate over the raw rows, TopKSpec
    * property). Touches segments × keys × k rows, never the corpus —
    * the q136/q179 serve economics applied to ranking.
    */
  def serveTopK(partials: DataFrame, keyCols: Seq[String], ordCol: String,
                idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val f = udaf(topKAgg(k))
    explodeRanked(
      partials.select(keyCols.map(col) :+ explode(col("_top")).as("_e"): _*)
        .groupBy(keyCols.map(col): _*)
        .agg(f(col("_e._1"), col("_e._2")).as("_top")),
      keyCols, ordCol, idCol)
  }
}
