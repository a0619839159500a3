package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** The one atomic directory-replacement protocol for PERSISTED
  * artifacts (rollup data, refresh output): write the next state into
  * `<target>.next`, rename `<target>` aside to `<target>.old`, rename
  * `.next` into place, drop `.old` — a reader sees the old state or
  * the new, never a mix. Hadoop-FileSystem based, so it works wherever
  * the artifact lives (local, HDFS, object stores with rename).
  *
  * Failure discipline (review finding, r13): a failed second rename
  * best-effort RESTORES `.old` before throwing, so a live registration
  * pointing at the target never dangles on a missing directory; a
  * crash between the two renames is healed by [[recover]] at the top
  * of the next writer invocation (and tolerated by readers — the
  * routing rule falls through to the base while the target is absent).
  *
  * [[graft.streaming.StreamOps]]'s snapshot sinks keep a sibling
  * java.io implementation with the SAME `.next`/`.old` suffix protocol
  * — deliberately: those sinks' fences are java.nio local files by
  * contract, and resolving their caller paths through the default
  * Hadoop FS would silently retarget them on HDFS-default clusters.
  * Keep the two in lockstep when changing either. */
private[graft] object AtomicSwap {

  def suffixed(target: Path, s: String): Path =
    new Path(target.getParent, target.getName + s)

  /** Heal a crash between the two renames: `.old` holds the only copy. */
  def recover(fs: FileSystem, target: Path): Unit = {
    val old = suffixed(target, ".old")
    if (!fs.exists(target) && fs.exists(old) && !fs.rename(old, target))
      throw new java.io.IOException(
        s"cannot recover crashed swap at $target")
  }

  /** Drop leftovers a superseding full rebuild makes obsolete — a
    * stale `.old` MUST go, or a later [[recover]] could resurrect an
    * ancient artifact over the fresh one. */
  def dropLeftovers(fs: FileSystem, target: Path): Unit = {
    fs.delete(suffixed(target, ".old"), true)
    fs.delete(suffixed(target, ".next"), true)
    ()
  }

  def swapInto(fs: FileSystem, target: Path)(write: Path => Unit): Unit = {
    val next = suffixed(target, ".next")
    fs.delete(next, true)
    write(next)
    val old = suffixed(target, ".old")
    fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"swap: cannot stage $target")
    if (!fs.rename(next, target)) {
      val restored = fs.exists(old) && fs.rename(old, target)
      throw new java.io.IOException(
        s"swap: cannot move $next into place" +
          (if (restored) " (previous state restored)"
           else s" and could not restore $old — restore it manually"))
    }
    fs.delete(old, true)
    ()
  }
}
