package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** The journaled swap protocol ([[TableSwap.replace]]): happy path, and
  * recovery from simulated mid-rename crash states — the object-store
  * windows where a directory "rename" is per-file copy+delete and a crash
  * leaves the only copy SPLIT across two directories. States are staged on
  * the local FS exactly as an interrupted move leaves them (files split,
  * journal present) and replace() must converge without losing a file.
  */
class TableSwapSpec extends SparkSpec {

  private def dir(): String =
    Files.createTempDirectory("graft-swap").toString + "/table"

  private def writeFile(path: String, content: String): Unit = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    java.nio.file.Files.writeString(f.toPath, content)
  }
  private def listNames(path: String): Set[String] = {
    val f = new java.io.File(path)
    if (!f.exists) Set.empty else f.list().toSet
  }
  private def readFile(path: String): String =
    java.nio.file.Files.readString(new java.io.File(path).toPath)

  test("happy path: replace swaps contents and leaves no scaffolding") {
    val t = dir()
    writeFile(s"$t/part-1", "v1")
    writeFile(s"$t/_SUCCESS", "")
    TableSwap.replace(spark, t) { staging =>
      // the writer sees the CURRENT table while producing the next one
      assert(readFile(s"$t/part-1") === "v1")
      writeFile(s"$staging/part-1", "v2")
      writeFile(s"$staging/_SUCCESS", "")
    }
    assert(readFile(s"$t/part-1") === "v2")
    assert(!new java.io.File(t + "__old").exists)
    assert(!new java.io.File(t + "__staging").exists)
    assert(!new java.io.File(t + "__swapstate").exists)
  }

  test("recovery from a mid-RETIRE crash: split old table converges, no file lost") {
    val t = dir()
    // the interrupted table→__old move made it halfway: _SUCCESS and one
    // part already under __old, the other part still at the table path —
    // the marker-moved-first order that defeated the _SUCCESS heuristic
    writeFile(s"$t/part-1", "old-1")
    writeFile(s"${t}__old/part-0", "old-0")
    writeFile(s"${t}__old/_SUCCESS", "")
    writeFile(s"${t}__swapstate", "retire")
    var seen: Set[String] = Set.empty
    TableSwap.replace(spark, t) { staging =>
      seen = listNames(t) // writer must see the fully restored old table
      writeFile(s"$staging/part-1", "new")
      writeFile(s"$staging/_SUCCESS", "")
    }
    assert(seen === Set("part-0", "part-1", "_SUCCESS"))
    assert(readFile(s"$t/part-1") === "new")
    assert(!new java.io.File(t + "__old").exists)
    assert(!new java.io.File(t + "__swapstate").exists)
  }

  test("recovery from a mid-PROMOTE crash rolls the committed write forward") {
    val t = dir()
    // staging→table move interrupted: part-0 already promoted, part-1
    // still in staging; the complete OLD table waits under __old
    writeFile(s"$t/part-0", "new-0")
    writeFile(s"${t}__staging/part-1", "new-1")
    writeFile(s"${t}__old/part-0", "old-0")
    writeFile(s"${t}__old/_SUCCESS", "")
    writeFile(s"${t}__swapstate", "promote")
    var seen: Set[String] = Set.empty
    TableSwap.replace(spark, t) { staging =>
      seen = listNames(t) // writer must see the rolled-forward NEW table
      writeFile(s"$staging/part-0", "newer")
    }
    assert(seen === Set("part-0", "part-1"))
    assert(readFile(s"$t/part-0") === "newer")
    assert(!new java.io.File(t + "__old").exists)
    assert(!new java.io.File(t + "__swapstate").exists)
  }

  test("journal-less recovery: surviving __old restores a missing table; stale __old is dropped") {
    val t = dir()
    writeFile(s"${t}__old/part-0", "old")
    TableSwap.replace(spark, t) { staging =>
      assert(readFile(s"$t/part-0") === "old") // restored before write runs
      writeFile(s"$staging/part-0", "new")
    }
    assert(readFile(s"$t/part-0") === "new")

    // both dirs present without a journal = the swap completed far enough
    // that the table is live; the leftover __old is dropped
    writeFile(s"${t}__old/part-0", "stale")
    TableSwap.replace(spark, t) { staging =>
      writeFile(s"$staging/part-0", "newer")
    }
    assert(readFile(s"$t/part-0") === "newer")
    assert(!new java.io.File(t + "__old").exists)
  }

  test("recovery merges a partition subdir split across both sides — no nesting") {
    val t = dir()
    // hive-partitioned table interrupted mid-retire: p_date=2024-01-01
    // exists on BOTH sides with different files — a flat rename would
    // move the __old copy INTO the table's copy (p_date=.../p_date=...)
    writeFile(s"$t/p_date=2024-01-01/part-1", "old-1")
    writeFile(s"${t}__old/p_date=2024-01-01/part-0", "old-0")
    writeFile(s"${t}__old/p_date=2024-02-02/part-0", "old-feb")
    writeFile(s"${t}__swapstate", "retire")
    var seen: Set[String] = Set.empty
    TableSwap.replace(spark, t) { staging =>
      seen = listNames(s"$t/p_date=2024-01-01")
      assert(listNames(t).forall(_.startsWith("p_date=")))
      writeFile(s"$staging/p_date=2024-01-01/part-0", "new")
    }
    assert(seen === Set("part-0", "part-1")) // merged flat, not nested
    assert(readFile(s"$t/p_date=2024-01-01/part-0") === "new")
    assert(!new java.io.File(t + "__old").exists)
  }

  test("recovery converges a file present on BOTH sides (copy done, delete not)") {
    val t = dir()
    // object-store rename = copy+delete per file; the crash hit after the
    // copy of part-0 but before its delete — identical bytes both sides.
    // mustRename onto the existing destination would return false and
    // wedge every later recovery; the source copy must be dropped instead.
    writeFile(s"$t/part-0", "old-0")
    writeFile(s"$t/part-1", "old-1")
    writeFile(s"${t}__old/part-0", "old-0")
    writeFile(s"${t}__swapstate", "retire")
    TableSwap.replace(spark, t) { staging =>
      assert(readFile(s"$t/part-0") === "old-0")
      assert(readFile(s"$t/part-1") === "old-1")
      writeFile(s"$staging/part-0", "new")
    }
    assert(readFile(s"$t/part-0") === "new")
    assert(!new java.io.File(t + "__old").exists)
    assert(!new java.io.File(t + "__swapstate").exists)
  }

  test("a stale journal tmp from a crash inside writeJournal is cleaned up") {
    val t = dir()
    writeFile(s"$t/part-0", "v1")
    writeFile(s"${t}__swapstate.tmp", "retire") // crash before the rename
    TableSwap.replace(spark, t) { staging =>
      writeFile(s"$staging/part-0", "v2")
    }
    assert(readFile(s"$t/part-0") === "v2")
    assert(!new java.io.File(t + "__swapstate.tmp").exists)
    assert(!new java.io.File(t + "__swapstate").exists)
  }

  test("an unrecognized journal state fails loudly instead of guessing") {
    val t = dir()
    writeFile(s"$t/part-0", "v1")
    writeFile(s"${t}__swapstate", "garbage")
    intercept[IllegalStateException] {
      TableSwap.replace(spark, t)(_ => ())
    }
  }

  test("a trailing-slash path keeps scaffolding OUTSIDE the table directory") {
    val t = dir()
    writeFile(s"$t/part-1", "v1")
    TableSwap.replace(spark, t + "/") { staging =>
      // staging must be a sibling of the table, never inside it — a
      // string-concat "$path__staging" on a trailing-slash path was a
      // child the swap then read back as table rows and dragged into __old
      assert(!staging.replace('\\', '/').contains("//" + "_"))
      assert(new java.io.File(staging).getParentFile.getCanonicalPath ===
        new java.io.File(t).getParentFile.getCanonicalPath)
      writeFile(s"$staging/part-1", "v2")
    }
    assert(readFile(s"$t/part-1") === "v2")
    assert(listNames(t) === Set("part-1")) // no scaffolding inside
    assert(!new java.io.File(t + "__old").exists)
    assert(!new java.io.File(t + "__swapstate").exists)
  }

  test("recovery from a crash mid FIRST-write promote: split only-copy converges") {
    val t = dir()
    // the first-ever write crashed mid staging→table move: part-0 already
    // promoted, part-1 still in staging, NO __old — the journaled
    // first-write promote leaves "promote", whose roll-forward converges;
    // unjournaled, the next run would silently delete the staging half
    writeFile(s"$t/part-0", "new-0")
    writeFile(s"${t}__staging/part-1", "new-1")
    writeFile(s"${t}__swapstate", "promote")
    var seen: Set[String] = Set.empty
    TableSwap.replace(spark, t) { staging =>
      seen = listNames(t) // writer must see the fully converged table
      writeFile(s"$staging/part-0", "v2")
    }
    assert(seen === Set("part-0", "part-1"))
    assert(readFile(s"$t/part-0") === "v2")
    assert(!new java.io.File(t + "__swapstate").exists)
  }
}
