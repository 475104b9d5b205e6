package graft
package ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization barrier for multi-consumer intermediates (the
  * shingle/signature/bucket tables every near-dup builder scans from
  * several plan branches — without a barrier each branch re-tokenizes
  * and re-hashes the whole corpus, and a self-join defeats
  * ReusedExchange).
  *
  * The MECHANISM is pluggable because the right barrier is
  * deployment-dependent:
  *  - [[Materialize.Local]] (the local default): `localCheckpoint()` —
  *    eager, truncates lineage, but blocks are executor-local and NOT
  *    replicated, so on a real cluster one lost executor kills the
  *    job mid-pipeline;
  *  - [[Materialize.Cache]]: lazy `persist()` — no eager job at plan
  *    construction, lineage kept, lost blocks are recomputed — the
  *    fault-tolerant in-memory choice;
  *  - [[Materialize.Reliable]]: `checkpoint()` to the session's
  *    checkpoint directory (HDFS/object store on a cluster) —
  *    replicated, survives executor loss; the 100 TB choice, and the
  *    moral equivalent of the signature-table write a production dedup
  *    pipeline persists anyway;
  *  - [[Materialize.Off]]: no barrier — every consumer recomputes
  *    (correctness-neutral; for single-consumer contexts or tests).
  *
  * All strategies are RESULT-IDENTICAL (MaterializeSpec proves it on
  * the minhash path); only cost and fault-tolerance differ.
  */
trait Materializer {
  /** Materialize (or mark for reuse) a multi-consumer intermediate. */
  def apply(df: DataFrame): DataFrame

  /** Release resources `apply` holds for `df` (cache blocks). No-op
    * unless the strategy allocates something releasable.
    */
  def release(df: DataFrame): Unit = ()

  /** LAZY lineage-TRUNCATING barrier for iterative round frames
    * (connected components, k-means): the returned plan is a flat scan
    * of a to-be-materialized RDD, so round k's plan does not nest
    * round k-1's (a lazy `persist` would nest them — the plan tree
    * grows ~4x per round and overflows the stack by round ~10), and
    * materialization happens inside the CALLER's next action — which
    * is how a convergence aggregate and the round's materialization
    * stay one single job. Default: lazy local checkpoint; [[
    * Materialize.Reliable]] overrides with a lazy reliable checkpoint.
    */
  def iterative(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)
}

object Materialize {

  /** Executor-local checkpoint: eager, lineage-truncating,
    * non-replicated. Right on local[*]; on a cluster prefer
    * [[Reliable]] (executor loss is routine at 1000 executors).
    */
  case object Local extends Materializer {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint()
  }

  /** LAZY local checkpoint: the same ExistingRDD seal and
    * compute-once storage as [[Local]], but materialized inside the
    * FIRST consuming action instead of an eager job of its own — on
    * local[*] this removes one scheduled job per barrier, and when
    * one action consumes several lazy barriers their subtrees
    * materialize CONCURRENTLY inside that job (block locks make
    * first-touch compute-once). USE ONLY where every consumption is
    * ordered AFTER construction with no same-call STATE MUTATION of
    * the barrier's inputs in between: an eager barrier snapshots its
    * input at construction, a lazy one at first consumption — if a
    * caller mutates a state directory the barrier's plan reads
    * before the first action touches it, lazy would read the mutated
    * state (the streaming batch protocol was audited call site by
    * call site for exactly this ordering — round-18 optimization).
    */
  case object LocalLazy extends Materializer {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)
  }

  /** Lazy cache: no job at plan-construction time; blocks rebuilt from
    * lineage on loss.
    *
    * `iterative` caveat: round frames need a lineage-TRUNCATING barrier
    * (persist nests plans — see [[Materializer.iterative]]), and the
    * only truncating barriers are checkpoints. When the session has a
    * checkpoint directory configured, Cache uses a lazy RELIABLE
    * checkpoint so the fault tolerance the caller picked Cache for
    * extends to the iterative loops; without one it falls back to the
    * non-replicated lazy localCheckpoint (executor loss mid-loop then
    * kills the job — configure `sparkContext.setCheckpointDir` on a
    * real cluster).
    */
  final case class Cache(level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      extends Materializer {
    def apply(df: DataFrame): DataFrame = df.persist(level)
    override def release(df: DataFrame): Unit = { df.unpersist(); () }
    override def iterative(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
  }

  /** Reliable checkpoint into `dir` (set as the session checkpoint dir
    * if none is configured): replicated storage, survives executor
    * loss — the cluster-scale barrier.
    */
  final case class Reliable(dir: String) extends Materializer {
    private def withDir(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
      df
    }
    def apply(df: DataFrame): DataFrame = withDir(df).checkpoint()
    override def iterative(df: DataFrame): DataFrame =
      withDir(df).checkpoint(eager = false)
  }

  /** No barrier: every consumer recomputes the branch. */
  case object Off extends Materializer {
    def apply(df: DataFrame): DataFrame = df
  }
}
