package graft.etl

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The scaled-baseline generator must be byte-deterministic (pandas and
  * Spark are timed on the SAME file contents) and its dirt must clean
  * identically in both engines — the pandas reference run
  * (tools/bench_baseline.py) reports 77542 clean rows on the 80k file
  * (~3.1% dirt, the reference CSV's own rate), which the Spark clean must
  * reproduce exactly.
  */
class TradesGenSpec extends SparkSpec {

  test("generation is byte-deterministic for a fixed (rows, seed)") {
    val d = Files.createTempDirectory("graft-gen").toString
    TradesGen.generate(s"$d/a.csv", 2000)
    TradesGen.generate(s"$d/b.csv", 2000)
    val a = Files.readAllBytes(Paths.get(s"$d/a.csv"))
    val b = Files.readAllBytes(Paths.get(s"$d/b.csv"))
    assert(java.util.Arrays.equals(a, b))
    assert(new String(a).linesIterator.next() ===
      "timestamp,user_id,client_type,symbol,side,quantity,price")
  }

  test("80k bench file: Spark clean count matches the pandas reference") {
    val path = TradesGen.ensure("/root/repo/bench_data/trades_80k.csv", 80000)
    val clean = TradesEtl.clean(TradesEtl.extract(spark, path))
    // 77542 = len(ref.extract(path)) via tools/bench_baseline.py — the two
    // engines must agree on exactly which dirty rows drop
    assert(clean.count() === 77542L)
  }
}
