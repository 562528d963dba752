package graft.etl

import java.io.File
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The crash-safe publish discipline, tested pure-JVM: atomic publish,
  * failure cleanup, and the stale-temp sweep — including orphans from the
  * legacy fixed `<name>.tmp` naming, which the unique-name prefix match
  * alone would leave on disk forever.
  */
class AtomicFilesSpec extends AnyFunSuite {

  private def tmpDir(): File = {
    val d = Files.createTempDirectory("atomicfiles-spec").toFile
    d.deleteOnExit(); d
  }

  test("successful write publishes atomically and leaves no temp") {
    val dir = tmpDir(); val out = new File(dir, "a.bin")
    AtomicFiles.write(out.getPath)(f => Files.writeString(f.toPath, "payload"))
    assert(Files.readString(out.toPath) === "payload")
    assert(dir.listFiles().map(_.getName).toSet === Set("a.bin"))
  }

  test("failed body removes its temp and rethrows") {
    val dir = tmpDir(); val out = new File(dir, "a.bin")
    val e = intercept[RuntimeException] {
      AtomicFiles.write(out.getPath) { f =>
        Files.writeString(f.toPath, "partial"); throw new RuntimeException("boom")
      }
    }
    assert(e.getMessage === "boom")
    assert(!out.exists())
    assert(dir.listFiles().isEmpty, "no orphaned temp after a failed write")
  }

  test("failed pre-publish fsync removes its temp and rethrows") {
    // body succeeds but deletes its own temp, so the data-fsync open
    // throws NoSuchFileException — the failure path AFTER body but BEFORE
    // publish. Regression for the gap where only body(tmp) was wrapped by
    // the cleanup catch: a throwing fsync left the orphan to the 1-hour
    // stale sweep.
    val dir = tmpDir(); val out = new File(dir, "a.bin")
    intercept[java.nio.file.NoSuchFileException] {
      AtomicFiles.write(out.getPath) { f =>
        Files.writeString(f.toPath, "partial"); Files.delete(f.toPath)
      }
    }
    assert(dir.listFiles().isEmpty) // no publish, no orphaned temp
  }

  test("a published path ending in .tmp is refused — the legacy sweep would later delete it") {
    val dir = tmpDir()
    val e = intercept[IllegalArgumentException] {
      AtomicFiles.write(new File(dir, "report.csv.tmp").getPath)(
        f => Files.writeString(f.toPath, "x"))
    }
    assert(e.getMessage.contains(".tmp"))
    assert(dir.listFiles().isEmpty)
  }

  test("sweep removes stale unique-name AND legacy fixed-name orphans, keeps fresh and unrelated") {
    val dir = tmpDir(); val out = new File(dir, "a.bin")
    val staleUnique = new File(dir, "a.bin.tmp.123.dead-beef")
    val staleLegacy = new File(dir, "a.bin.tmp") // pre-unique-naming orphan
    val freshTmp    = new File(dir, "a.bin.tmp.456.live")
    val unrelated   = new File(dir, "b.bin.tmp")
    Seq(staleUnique, staleLegacy, freshTmp, unrelated)
      .foreach(f => Files.writeString(f.toPath, "x"))
    val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    assert(staleUnique.setLastModified(old) && staleLegacy.setLastModified(old)
      && unrelated.setLastModified(old))
    AtomicFiles.write(out.getPath)(f => Files.writeString(f.toPath, "v"))
    val left = dir.listFiles().map(_.getName).toSet
    assert(!left.contains("a.bin.tmp.123.dead-beef"), "stale unique temp swept")
    assert(!left.contains("a.bin.tmp"), "stale LEGACY temp swept")
    assert(left.contains("a.bin.tmp.456.live"), "a live writer's temp is never swept")
    assert(left.contains("b.bin.tmp"), "another path's temp is not ours to sweep")
    assert(left.contains("a.bin"))
  }
}
