package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** The staged-swap idiom shared by every directory-layout index rewrite
  * (compaction, segment merge, full rebuild): write the new layout to a
  * stage sibling, then delete the live dir and rename the stage in.
  *
  * The one subtle state is a crash BETWEEN the delete and the rename:
  * the stage dir then holds the ONLY copy of the index, and a retry
  * that starts by wiping the stage would destroy it. [[recoverOrClearStage]]
  * is therefore recovery-first: live missing + stage present can only
  * mean the previous attempt's write completed (the delete never runs
  * before the write job lands), so the stage IS the index — finish the
  * rename and report the recovery; the stage is cleared only when the
  * live dir still exists, i.e. the stage is a partial write from a
  * crash before the swap started.
  *
  * Single-writer, like every index-maintenance op here; the delete+
  * rename instant can still race a concurrent READER, as with any
  * non-transactional table format.
  */
private[graft] object StagedSwap {

  /** Call FIRST on every staged rewrite. Returns true if a crashed swap
    * was completed (stage promoted to live) — the recovered live dir is
    * a complete index, so callers just proceed to rewrite from it.
    */
  def recoverOrClearStage(fs: FileSystem, live: Path, stage: Path): Boolean =
    if (recoverCrashedSwap(fs, live, stage)) true
    else {
      if (fs.exists(stage)) fs.delete(stage, true)
      false
    }

  /** Promote-ONLY recovery for readers/appenders that are not about to
    * rewrite: if a crashed swap left the only copy in the stage (live
    * missing, stage present), finish the rename; otherwise touch
    * NOTHING — clearing a partial stage is the rewriter's own
    * [[recoverOrClearStage]] job. Streaming maintenance loops must call
    * this at batch start BEFORE their `fs.exists(live)` guard: without
    * it, a mid-swap crash makes the loop mistake the orphaned index for
    * a first-ever ingest, rebuild a near-empty live dir, and the next
    * compaction then clears the stage holding all history — a permanent
    * silent loss.
    */
  def recoverCrashedSwap(fs: FileSystem, live: Path, stage: Path): Boolean =
    if (!fs.exists(live) && fs.exists(stage)) {
      require(fs.rename(stage, live),
        s"recovering crashed swap: rename $stage -> $live failed")
      true
    } else false

  /** Promote a fully-written stage dir to live. */
  def swap(fs: FileSystem, live: Path, stage: Path): Unit = {
    if (fs.exists(live)) fs.delete(live, true)
    require(fs.rename(stage, live), s"rename $stage -> $live failed")
  }
}
