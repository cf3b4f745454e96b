package graft.core

/** Single source of truth for tmpfs-backed scratch space (benchmarks,
  * derived-table caches, pipeline demo outputs): /dev/shm when the host
  * has one — with 32 concurrent writers a disk-backed dir becomes the
  * bottleneck and inverts scaling curves — else the JVM temp dir. */
object TmpFs {
  def base: String =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
    else System.getProperty("java.io.tmpdir")

  /** Populate a SHARED deterministic cache directory exactly once across
    * concurrent JVMs: `write` lands in a per-pid staging dir which is then
    * atomically renamed to `target` (rename is atomic within a tmpfs/posix
    * filesystem, and never exposes a torn directory). If another process
    * won the race meanwhile, the staging copy is discarded — the reader
    * either sees no directory or a complete `_SUCCESS`-gated one, never a
    * partial write (the prior design had both processes writing the SAME
    * path and one could scan the other's half-written table).
    *
    * Returns `target`. `write` receives the staging path and must leave a
    * `_SUCCESS` marker (Spark writers do). */
  def ensureShared(target: String)(write: String => Unit): String = {
    val done = new java.io.File(target, "_SUCCESS")
    if (!done.exists()) {
      // self-heal a TORN target (present without _SUCCESS — a crash under
      // a pre-staging design, or external damage): the publish rename
      // below cannot land on an existing directory, so the garbage must
      // go. Deleting in place would race a concurrent publisher (their
      // complete table could land between our check and the delete), so
      // we first take atomic OWNERSHIP of whatever sits at the path by
      // renaming it aside, then inspect what we actually grabbed: torn →
      // drop it; complete (a racer published after our _SUCCESS check) →
      // put it back (or drop ours if yet another complete copy landed —
      // content is deterministic, any complete copy is the right one).
      val tornAside = new java.io.File(
        s"$target.torn-${ProcessHandle.current().pid()}")
      // re-check _SUCCESS at the last instant before grabbing the path: a
      // racer may have published a COMPLETE target since the check above,
      // and briefly renaming a complete table aside would let a third
      // reader transiently see it missing. The window shrinks to
      // check→rename (the restore branch below still handles a racer that
      // slips inside it).
      if (new java.io.File(target).exists() && !done.exists() &&
          new java.io.File(target).renameTo(tornAside)) {
        if (new java.io.File(tornAside, "_SUCCESS").exists()) {
          if (!tornAside.renameTo(new java.io.File(target)))
            org.apache.commons.io.FileUtils.deleteQuietly(tornAside)
        } else org.apache.commons.io.FileUtils.deleteQuietly(tornAside)
      }
      // sweep orphaned staging/torn dirs of DEAD processes for this target
      // (a SIGKILL mid-populate skips the cleanup paths; on /dev/shm the
      // orphan would otherwise hold RAM until reboot)
      val t = new java.io.File(target)
      Seq(".staging-", ".torn-").foreach { kind =>
        Option(t.getParentFile.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith(t.getName + kind))
          .foreach { orphan =>
            val pid = orphan.getName.substring((t.getName + kind).length)
            val alive = pid.toLongOption.exists { p =>
              val h = ProcessHandle.of(p)
              h.isPresent && h.get().isAlive
            }
            if (!alive) org.apache.commons.io.FileUtils.deleteQuietly(orphan)
          }
      }
      // the quarantine dance may have just restored a racer's complete
      // copy — re-check before paying the write
      if (!done.exists()) {
        val staging = s"$target.staging-${ProcessHandle.current().pid()}"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
        try {
          write(staging)
          require(new java.io.File(staging, "_SUCCESS").exists(),
            s"cache write to $staging left no _SUCCESS marker")
          // a failed rename means another process won the race (identical
          // deterministic content) — use theirs; staging drops in the finally
          new java.io.File(staging).renameTo(new java.io.File(target))
          require(done.exists(), s"cache at $target incomplete after populate")
        } finally
          // success renames staging away; every failure/lost-race path must
          // drop it, or the remnant accretes in the shared tmpfs forever
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
      }
    }
    target
  }
}
