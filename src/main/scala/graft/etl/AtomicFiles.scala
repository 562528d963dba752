package graft.etl

import java.io.File

/** The one copy of the crash-safe local-file publish discipline shared by
  * every driver-side sink ([[Xlsx]], [[Charts]], [[TradesGen]]): create the
  * parent directories, write the payload to a unique `<path>.tmp.<pid>.<uuid>`
  * temp file, then atomically rename over the published path — an
  * interrupted write never leaves a truncated artifact where a reader
  * could pick it up.
  */
object AtomicFiles {

  /** A killed process (OOM-kill mid-write) orphans its temp file, and
    * unique names mean no later writer overwrites it — so each write first
    * sweeps SIBLING temps of the same path older than this. One hour is
    * ~60× the longest single write here (TradesGen's 420 MB CSV, ~1 min),
    * so a live concurrent writer's temp is never swept.
    */
  private val staleTmpMs = 60L * 60 * 1000

  /** Run `body` against the temp file, then publish it at `path`. The temp
    * file is removed on failure so a crashed write leaves nothing behind.
    * The temp name is unique per process+call — two concurrent writers of
    * the SAME path race only at the final atomic rename (last one wins,
    * both files complete), never by clobbering each other's half-written
    * temp file as a fixed ".tmp" suffix would.
    */
  def write(path: String)(body: File => Unit): Unit = {
    // a published path ending in ".tmp" would be indistinguishable from a
    // legacy orphan and could be DELETED by a sibling writer's stale
    // sweep an hour later — refuse up front rather than lose an artifact
    require(!path.endsWith(".tmp"),
      s"published path must not end in '.tmp' (reserved for temp files): $path")
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    sweepStaleTmps(f)
    val tmp = new File(path + ".tmp." +
      ProcessHandle.current().pid() + "." + java.util.UUID.randomUUID())
    try {
      body(tmp)
      // force the temp file's DATA to disk before the rename: on ext4/xfs
      // the rename metadata can otherwise reach disk first, and a power
      // loss in between leaves the published name pointing at truncated/
      // zero blocks — the previous good artifact gone AND the new one
      // corrupt, the exact failure the atomic publish exists to prevent.
      // Inside the cleanup try: a failed fsync (ENOSPC at flush, device
      // error) must delete the temp now, not leave an orphan to the
      // 1-hour stale sweep.
      val ch = java.nio.channels.FileChannel.open(tmp.toPath,
        java.nio.file.StandardOpenOption.WRITE)
      try ch.force(true) finally ch.close()
    } catch { case e: Throwable =>
      // cleanup must be best-effort AND visible: a silently-failed delete
      // (open handle, permission flip) leaves the temp to the next sweep,
      // which is fine, but only if someone can see it happened
      try java.nio.file.Files.deleteIfExists(tmp.toPath)
      catch { case e2: Throwable => System.err.println(
        s"[atomic-files] failed to clean up $tmp after write failure: ${e2.getMessage}") }
      throw e
    }
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // fsync the parent directory so the rename itself is durable. Opening a
    // directory channel is platform-dependent (works on Linux, EISDIR/
    // access-denied elsewhere) — best-effort by design: the data fsync
    // above already guarantees whichever name survives points at complete
    // bytes; this only narrows the window where the OLD name could come
    // back after a crash.
    try {
      val dir = Option(f.getParentFile).getOrElse(new File("."))
      val ch = java.nio.channels.FileChannel.open(dir.toPath,
        java.nio.file.StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: Throwable => () }
  }

  private def sweepStaleTmps(published: File): Unit = {
    // exact "<name>.tmp" (no trailing dot) covers orphans from the legacy
    // fixed-suffix naming, which the unique-name prefix would never match
    // — those would otherwise persist forever
    val legacy = published.getName + ".tmp"
    val prefix = legacy + "."
    val now    = System.currentTimeMillis()
    Option(published.getParentFile).filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles())).getOrElse(Array.empty[File])
      .foreach { s =>
        if ((s.getName.startsWith(prefix) || s.getName == legacy) &&
            now - s.lastModified() > staleTmpMs)
          s.delete() // best-effort; a failed delete just waits for next sweep
      }
  }
}
