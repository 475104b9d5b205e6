package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Warehouse hygiene: delete PROVABLY-STALE versioned state and model
  * assets from a spark-warehouse directory.
  *
  * Why this exists (round 18): the official bench runs from the repo
  * checkout, whose `spark-warehouse/` had accumulated 18 rounds of
  * state — 7,770 files across 355 dirs, including pre-versioning
  * state dirs (`graft_q269_state_<sfx>` next to the live
  * `graft_q269_state_d16_<sfx>`) and model tables keyed by older
  * TrainDefV tokens. A same-box, same-tree A/B (37 identical bench
  * entries) read 88.8 s from the stale checkout vs 79.2 s from a
  * fresh worktree — a ~12% whole-suite tax that had been misread as
  * a tree-level regression. Untouched queries (q03: 1.67 vs 1.32 s)
  * inflate through interleaved-neighbor pressure, not through reading
  * the stale dirs themselves. Moving the warehouse aside recovered it
  * (83.8 s, q03 1.31 s). PROFILE.md round 18 has the full ladder.
  *
  * At 100 TB the same discipline applies: every TrainDefV bump
  * orphans the previous version's state/model directories — nothing
  * ever reads them again (the new name misses the catalog and
  * training reruns), so they are pure storage + listing + cache
  * pressure. This tool deletes exactly the orphans and nothing else:
  *
  *  - any warehouse entry whose name carries a version token `_dNN_`
  *    with NN != the current [[graft.queries.OpsQueries.TrainDefV]];
  *  - any legacy `graft_*_state_*` entry with NO version token (the
  *    pre-d16 state paths — superseded by the versioned discipline).
  *
  * Unversioned data assets (bloom/zorder/manifest/bm25/bpe tables,
  * keyed by dataset path, reused across rounds) are NEVER touched:
  * they are live serve-from-asset inputs, not versioned state.
  *
  * Usage: `runMain graft.tools.StateGc [warehouseDir] [--apply]`
  * Dry-run by default — prints what it would delete and the live/
  * stale counts; `--apply` deletes.
  */
object StateGc {

  private val VersionTok = "_(d\\d+)_".r

  /** Pure classification so the rule is unit-testable against the
    * real observed names. `v` is the CURRENT TrainDefV token.
    */
  def isStale(name: String, v: String): Boolean = {
    val toks = VersionTok.findAllMatchIn(name).map(_.group(1)).toList
    if (toks.nonEmpty) toks.exists(_ != v)
    else name.startsWith("graft_") && name.contains("_state_")
  }

  private def rmTree(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(rmTree)
    Files.deleteIfExists(p)
    ()
  }

  private def countFiles(p: Path): Long =
    if (!Files.isDirectory(p)) 1L
    else Files.list(p).iterator().asScala.map(countFiles).sum

  /** Classify-and-optionally-delete; the shared engine for the CLI
    * form below and the bench's pre-warmup hygiene pass. Returns
    * (staleEntries, staleFiles, liveEntries); logs through `out` so
    * the bench can prefix its own tag.
    */
  def gc(wh: Path, v: String, apply: Boolean,
         out: String => Unit = println): (Int, Long, Int) = {
    if (!Files.isDirectory(wh)) return (0, 0L, 0)
    val entries = Files.list(wh).iterator().asScala.toList.sortBy(_.toString)
    val (stale, live) = entries.partition(p => isStale(p.getFileName.toString, v))
    val staleFiles = stale.map(countFiles).sum
    stale.foreach { p =>
      out(s"stale: ${p.getFileName}")
      if (apply) rmTree(p)
    }
    (stale.size, staleFiles, live.size)
  }

  def main(args: Array[String]): Unit = {
    val apply = args.contains("--apply")
    val wh = Paths.get(
      args.filterNot(_ == "--apply").headOption
        .getOrElse("spark-warehouse"))
    val v = graft.queries.OpsQueries.TrainDefV
    if (!Files.isDirectory(wh)) {
      println(s"[stategc] no warehouse at $wh — nothing to do")
      return
    }
    val (nStale, staleFiles, nLive) =
      gc(wh, v, apply, m => println(s"[stategc] $m"))
    val mode = if (apply) "DELETED" else "would delete (dry run; pass --apply)"
    println(s"[stategc] current version $v: $nLive live entries kept, " +
      s"$nStale stale entries / $staleFiles files $mode")
  }
}
