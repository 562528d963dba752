package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Crash-safe replace of a parquet table directory: write the new contents
  * to `path__staging`, retire the current table to `path__old` (rename, NOT
  * delete), move staging into place, drop __old. Every rename/delete
  * result is checked (Hadoop FileSystem reports failure by returning
  * false, not throwing); an ignored false would silently corrupt the
  * table. A real deployment would use a MERGE-capable table format
  * (Delta/Iceberg) instead — this is that transaction for plain parquet.
  *
  * On HDFS a directory rename is atomic, so every crash window leaves a
  * complete copy under exactly one of table/__old/__staging. On OBJECT
  * STORES a "rename" is per-file copy+delete, so a crash can leave the
  * only copy SPLIT across two directories — and because `_SUCCESS` sorts
  * before `part-*`, the moved-marker-first order makes any
  * completeness-by-marker heuristic actively dangerous (round-7 review
  * finding: recovery classified a partial __old as complete and deleted
  * the unmoved part files). The swap therefore journals its phase in a
  * single `path__swapstate` file (object PUT/DELETE are atomic even on
  * S3) around each non-atomic directory move, and recovery first FINISHES
  * the interrupted move file-by-file (file moves converge: every file is
  * in exactly one of the two directories) before deciding what to keep.
  *
  * Shared by the streaming keyed-upsert sink and the compaction utility so
  * the swap + recovery protocol exists in exactly one place.
  *
  * SINGLE-WRITER CONTRACT: one `replace` per table path at a time. Two
  * concurrent callers (e.g. compaction racing the upsert sink on the same
  * path) share __staging and the journal and can promote each other's
  * half-written state — there is no lock or lease here, and a live journal
  * from a CONCURRENT writer is indistinguishable from the crash state this
  * protocol recovers. Serialize at the orchestration layer.
  */
object TableSwap {

  /** Run `write(stagingPath)` and atomically-ish swap the result into
    * `path`. Recovery for a previous crash runs FIRST, so `write` sees the
    * restored table when it reads `path`.
    */
  def replace(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val hPath   = new Path(path)
    val fs      = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // scaffolding derived from the NORMALIZED path, never by string concat:
    // a trailing-slash `path` would put "$path__staging" INSIDE the table
    // directory (read back as table rows, dragged into __old mid-swap)
    // while hPath normalizes to the directory itself
    val staging = hPath.suffix("__staging")
    val retired = hPath.suffix("__old")
    val journal = hPath.suffix("__swapstate")

    def mustRename(from: Path, to: Path): Unit =
      require(fs.rename(from, to), s"TableSwap: rename failed: $from -> $to")
    // Deletes that gate later correctness must also fail loudly: a stale
    // __old could be mistaken for crash state by a LATER recovery pass.
    def mustDelete(p: Path): Unit =
      require(fs.delete(p, true) || !fs.exists(p), s"TableSwap: delete failed: $p")

    val journalTmp = hPath.suffix("__swapstate.tmp")
    // tmp + rename, never create-with-overwrite on the live journal:
    // fs.create(journal, true) TRUNCATES the existing phase first, so a
    // crash mid-write left an empty/partial journal that recovery could
    // only refuse ("unrecognized state") — permanently wedging the swap.
    // With the tmp protocol the journal is either absent or complete: the
    // delete→rename window leaves NO journal, which the None branch
    // already converges (rollback; this call's write() redoes the work).
    def writeJournal(phase: String): Unit = {
      // no pre-delete of the tmp: create(_, overwrite = true) replaces it
      val out = fs.create(journalTmp, true)
      try out.write(phase.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      mustDelete(journal)
      mustRename(journalTmp, journal)
    }
    def readJournal(): Option[String] =
      if (!fs.exists(journal)) None
      else {
        val len = fs.getFileStatus(journal).getLen.toInt
        val buf = new Array[Byte](len)
        val in = fs.open(journal)
        try in.readFully(0, buf) finally in.close()
        Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
      }

    /** Finish an interrupted directory move: after a mid-rename crash each
      * file lives in exactly one of (src, dst), so moving the remainder
      * file-by-file converges to the state the whole-dir rename promised.
      */
    def moveAll(src: Path, dst: Path): Unit =
      if (fs.exists(src)) {
        if (!fs.exists(dst)) mustRename(src, dst)
        else {
          fs.listStatus(src).foreach { st =>
            val target = new Path(dst, st.getPath.getName)
            if (!fs.exists(target)) mustRename(st.getPath, target)
            // hive-partition subdir present on BOTH sides: merge
            // recursively — a flat rename into an existing directory
            // NESTS it (POSIX mv semantics: dst/p=1/p=1/part-*)
            else if (st.isDirectory) moveAll(st.getPath, target)
            // same FILE on both sides: the object-store copy half of the
            // interrupted per-file rename completed, only the source
            // delete didn't — the destination is a complete copy, so
            // converge by dropping the source (a rename here would
            // return false and wedge every later recovery pass)
            else mustDelete(st.getPath)
          }
          mustDelete(src)
        }
      }

    // ---- crash recovery (runs before the caller reads the table) ----
    readJournal() match {
      case Some("retire") =>
        // crashed while retiring table → __old: the OLD table may be
        // split across both dirs — converge it back under the table path
        // (one pass: every file is in exactly one of the two) and discard
        // staging (this call's write() redoes it).
        moveAll(retired, hPath)
        mustDelete(staging)
        mustDelete(journal)
      case Some("promote") =>
        // crashed while promoting __staging → table: the NEW table may be
        // split across both dirs (the old one is complete under __old,
        // but the new write had fully committed — roll forward).
        moveAll(staging, hPath)
        mustDelete(retired)
        mustDelete(journal)
      case Some(other) =>
        throw new IllegalStateException(
          s"TableSwap: unrecognized swap journal state '$other' at $journal")
      case None =>
        // no journal: either a clean state, or a crash from the pre-journal
        // protocol / outside the journaled windows (including writeJournal's
        // own delete→rename gap, which rolls BACK here). A whole-dir rename
        // that never started leaves complete dirs, so the simple rules
        // hold: missing table + surviving __old = crash between renames
        // (restore); both present = the swap completed far enough that the
        // table is live (drop the leftover __old).
        if (!fs.exists(hPath) && fs.exists(retired)) {
          // this restore is ITSELF a non-atomic directory move on an
          // object store: journal it, or a crash midway leaves the table
          // split across both dirs with no journal — and the next pass's
          // both-present rule below would delete the stranded half.
          // "retire"'s recovery (moveAll __old → table, discard staging)
          // is exactly the convergence this move needs.
          writeJournal("retire")
          moveAll(retired, hPath)
          mustDelete(journal)
        }
        else if (fs.exists(retired)) mustDelete(retired)
    }
    mustDelete(journalTmp) // stale tmp from a crash inside writeJournal
    mustDelete(staging)

    write(staging.toString) // executes fully (reading `path`) pre-swap

    if (fs.exists(hPath)) {
      writeJournal("retire")
      mustRename(hPath, retired)
      writeJournal("promote")
      mustRename(staging, hPath)
      mustDelete(journal)
      mustDelete(retired)
    } else {
      // FIRST write (no table yet): journal this promote too — it is the
      // same per-file non-atomic move on an object store, and an
      // unjournaled crash midway would leave the ONLY copy split, with
      // the next run's staging cleanup silently discarding the unmoved
      // half. Some("promote")'s moveAll roll-forward converges it.
      writeJournal("promote")
      mustRename(staging, hPath)
      mustDelete(journal)
    }
  }
}
