package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Crash-safe replace of a parquet table directory: write the new contents
  * to `path__staging`, retire the current table to `path__old` (rename, NOT
  * delete — every crash window leaves a complete copy under either the
  * table path or __old), move staging into place, drop __old. Every
  * rename/delete result is checked (Hadoop FileSystem reports failure by
  * returning false, not throwing); an ignored false would silently corrupt
  * the table. A real deployment would use a MERGE-capable table format
  * (Delta/Iceberg) instead — this is that transaction for plain parquet.
  *
  * Shared by the streaming keyed-upsert sink and the compaction utility so
  * the swap + recovery protocol exists in exactly one place.
  */
object TableSwap {

  /** Run `write(stagingPath)` and atomically-ish swap the result into
    * `path`. Recovery for a previous crash runs FIRST, so `write` sees the
    * restored table when it reads `path`.
    */
  def replace(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val hPath   = new Path(path)
    val fs      = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + "__staging")
    val retired = new Path(path + "__old")

    def mustRename(from: Path, to: Path): Unit =
      require(fs.rename(from, to), s"TableSwap: rename failed: $from -> $to")
    // Deletes that gate later correctness must also fail loudly: a stale
    // __old could be mistaken for crash state by a LATER recovery pass.
    def mustDelete(p: Path): Unit =
      require(fs.delete(p, true) || !fs.exists(p), s"TableSwap: delete failed: $p")
    // A completely-written table carries the committer's _SUCCESS marker; a
    // dir without it is a partial copy (e.g. a crashed copy+delete "rename"
    // on object stores, where rename is not atomic). If the cluster
    // disables marksuccessfuljobs, NEITHER dir has the marker and recovery
    // falls through to the drop-__old branch — never to a rollback of a
    // live table.
    def isComplete(p: Path): Boolean = fs.exists(new Path(p, "_SUCCESS"))

    // Crash recovery BEFORE the caller reads the table: if it is gone but
    // __old survives, the crash hit between the two renames — restore
    // __old. If both exist, discard the TABLE only when it is partial
    // (_SUCCESS absent) AND __old is complete; requiring isComplete(__old)
    // prevents restoring a partial __old over a usable table.
    if (!fs.exists(hPath) && fs.exists(retired)) mustRename(retired, hPath)
    else if (fs.exists(retired) && fs.exists(hPath) &&
        !isComplete(hPath) && isComplete(retired)) {
      mustDelete(hPath)
      mustRename(retired, hPath)
    } else if (fs.exists(retired)) mustDelete(retired)
    mustDelete(staging)

    write(staging.toString) // executes fully (reading `path`) pre-swap

    if (fs.exists(hPath)) {
      mustRename(hPath, retired)
      mustRename(staging, hPath)
      mustDelete(retired)
    } else {
      mustRename(staging, hPath)
    }
  }
}
