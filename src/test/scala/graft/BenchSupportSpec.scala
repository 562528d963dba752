package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench measurement-integrity policy, tested pure: which twin
  * readings count as implausible, when a re-measure fires, and that the
  * budget is one re-measure per twin — the logic that keeps the official
  * BENCH artifact honest on a host with heavy-tailed ambient stalls.
  */
class BenchSupportSpec extends AnyFunSuite {

  private def repair(first: Seq[Seq[Double]],
      remeasures: Map[Int, Seq[Double]]): (Seq[Seq[Double]], Seq[Int]) = {
    val calls = scala.collection.mutable.ArrayBuffer[Int]()
    val out = BenchSupport.repairTwins(first, 7.0) { i =>
      calls += i
      remeasures.getOrElse(i,
        fail(s"unexpected re-measure of twin $i (calls so far: $calls)"))
    }
    (out, calls.toSeq)
  }

  test("minValid: failed-rep sentinel never poisons the min") {
    assert(BenchSupport.minValid(Seq(-1.0, 3.2, 4.0)) === 3.2)
    assert(BenchSupport.minValid(Seq(-1.0, -1.0)) === -1.0)
    assert(BenchSupport.minValid(Nil) === -1.0)
  }

  test("clean monotone twins: no re-measure fires") {
    val (out, calls) = repair(Seq(Seq(0.5), Seq(0.9), Seq(3.8)), Map.empty)
    assert(calls === Nil)
    assert(out.map(BenchSupport.minValid) === Seq(0.5, 0.9, 3.8))
  }

  test("smaller twin slower than a larger one is re-measured once") {
    // 7.3s at 800k vs 4.1s at 8M — the round-7 observed stall shape
    val (out, calls) = repair(
      Seq(Seq(0.5), Seq(7.3), Seq(4.1)), Map(1 -> Seq(1.1)))
    assert(calls === Seq(1))
    assert(out.map(BenchSupport.minValid) === Seq(0.5, 1.1, 4.1))
  }

  test("largest twin above ratioCap x the next is re-measured") {
    val (out, calls) = repair(
      Seq(Seq(0.5), Seq(0.9), Seq(18.4, 15.1)), Map(2 -> Seq(4.1)))
    assert(calls === Seq(2))
    assert(out.map(BenchSupport.minValid) === Seq(0.5, 0.9, 4.1))
    // exactly at the cap is plausible — 7x covers the 3.7-5.7x clean band
    val (_, none) = repair(Seq(Seq(0.5), Seq(1.0), Seq(6.9)), Map.empty)
    assert(none === Nil)
  }

  test("repairing the largest downward exposes a polluted middle twin") {
    // middle 5.0 < largest 40 passes the first look; largest repairs to
    // 3.8, and NOW 5.0 > 3.8 must trigger the middle's re-measure — the
    // cascade the unrolled single-pass version shipped broken artifacts on
    val (out, calls) = repair(
      Seq(Seq(0.5), Seq(5.0), Seq(40.0)),
      Map(2 -> Seq(3.8), 1 -> Seq(0.9)))
    assert(calls === Seq(2, 1))
    assert(out.map(BenchSupport.minValid) === Seq(0.5, 0.9, 3.8))
  }

  test("a re-measure that comes back worse keeps the original min") {
    val (out, calls) = repair(
      Seq(Seq(0.5), Seq(0.9), Seq(9.0)), Map(2 -> Seq(12.0)))
    assert(calls === Seq(2))
    assert(BenchSupport.minValid(out(2)) === 9.0)
  }

  test("budget: a still-implausible twin is never re-measured twice") {
    // the re-measure lands implausible again (persistent ambient window);
    // the loop must terminate with one call, not spin
    val (_, calls) = repair(
      Seq(Seq(0.5), Seq(0.9), Seq(30.0)), Map(2 -> Seq(28.0)))
    assert(calls === Seq(2))
  }

  test("failed twins (-1) are never implausible and never block others") {
    val (out, calls) = repair(
      Seq(Seq(-1.0), Seq(0.9), Seq(3.8)), Map.empty)
    assert(calls === Nil)
    assert(out.map(BenchSupport.minValid) === Seq(-1.0, 0.9, 3.8))
    // largest valid with everything below failed: no prev min to ratio
    val (_, none) = repair(Seq(Seq(-1.0), Seq(-1.0), Seq(30.0)), Map.empty)
    assert(none === Nil)
  }
}
