package graft

import org.scalactic.Tolerance._
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

  // ---- jsonEscape -------------------------------------------------------

  test("jsonEscape: quote, backslash, and every control char") {
    assert(BenchSupport.jsonEscape("""a"b\c""") === """a\"b\\c""")
    assert(BenchSupport.jsonEscape("a\nb\rc\td") === """a\nb\rc\td""")
    // a control char with no shorthand gets the \u00XX form
    assert(BenchSupport.jsonEscape("xy") === "x\\u0001y")
    // the escaped form must round-trip through a real JSON parser: embed
    // it in a document and check nothing breaks structurally
    val hostile = "p\tath\n\"q\"\\"
    val doc = s"""{"k":"${BenchSupport.jsonEscape(hostile)}"}"""
    assert(!doc.exists(_ < ' '), "no raw control chars may survive")
    assert(doc.count(_ == '"') === 6) // {"k":"..."} + the two escaped \"
  }

  // ---- parseArtifactMins ------------------------------------------------

  test("parseArtifactMins: full bench line, detail file, truncated tail") {
    // full stdout line shape
    val line = """{"queries":{"q01_cond_agg":0.5,"q42b_bm25_rational":1.25},"value":1.75}"""
    assert(BenchSupport.parseArtifactMins(line) ===
      Map("q01_cond_agg" -> 0.5, "q42b_bm25_rational" -> 1.25))
    // detail-file shape: rep ARRAYS must not match, the mins section must
    val detail = """{"reps":{"q01_cond_agg":[9.0,0.5]},"queries":{"q01_cond_agg":0.5}}"""
    assert(BenchSupport.parseArtifactMins(detail) === Map("q01_cond_agg" -> 0.5))
    // front-truncated driver tail (starts mid-number) — later keys survive
    val tail = """4,"q33_rollup":0.61,"q34_distinct_agg":16.66}"""
    assert(BenchSupport.parseArtifactMins(tail) ===
      Map("q33_rollup" -> 0.61, "q34_distinct_agg" -> 16.66))
    // the driver wrapper embeds that tail as a JSON string VALUE, quotes
    // backslash-escaped — the raw-file shape the repair gate actually
    // reads (the first round-9 run parsed zero keys from it and silently
    // skipped every repair)
    val wrapper = """{"n":8,"rc":0,"tail":":0.227,\"q52_vocab\":0.272,\"q53_pack_bins\":0.188}"}"""
    assert(BenchSupport.parseArtifactMins(wrapper) ===
      Map("q52_vocab" -> 0.272, "q53_pack_bins" -> 0.188))
    // failed sentinel parses as negative (and is later ignored by the gate)
    assert(BenchSupport.parseArtifactMins("""{"q01_x":-1.0}""") === Map("q01_x" -> -1.0))
  }

  // ---- repairQueries ----------------------------------------------------

  private def repairQ(reps: Seq[(String, Seq[Double])], prev: Map[String, Double],
      maxRepairs: Int = 10, remeasures: Map[String, Seq[Double]] = Map.empty) = {
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val out = BenchSupport.repairQueries(reps, prev, 2.0, 0.25, maxRepairs) { n =>
      calls += n
      remeasures.getOrElse(n, fail(s"unexpected re-measure of $n"))
    }
    (out, calls.toSeq)
  }

  test("repairQueries: only >2x-and->0.25s regressions vs prev re-measure") {
    val reps = Seq(
      "qa" -> Seq(0.50, 0.52),  // 1x of prev — clean
      "qb" -> Seq(16.66, 17.0), // 20x of prev — the round-8 q34 shape
      "qc" -> Seq(0.20, 0.24),  // 4x of prev but under the 0.25s floor
      "qd" -> Seq(3.00, 3.10))  // no prev entry (truncated tail) — skip
    val prev = Map("qa" -> 0.5, "qb" -> 0.8, "qc" -> 0.05)
    val ((out, repaired), calls) = repairQ(reps, prev,
      remeasures = Map("qb" -> Seq(0.80, 0.85)))
    assert(calls === Seq("qb"))
    assert(repaired === Seq("qb"))
    // re-measured reps are appended; the min-of-all estimator recovers
    assert(out.toMap.apply("qb") === Seq(16.66, 17.0, 0.80, 0.85))
    assert(BenchSupport.minValid(out.toMap.apply("qb")) === 0.80)
    // untouched queries keep their reps verbatim, in the original order
    assert(out.map(_._1) === reps.map(_._1))
    assert(out.toMap.apply("qa") === Seq(0.50, 0.52))
  }

  test("repairQueries: budget caps at maxRepairs, worst ratio first") {
    val reps = Seq(
      "qa" -> Seq(5.0),  // 5x
      "qb" -> Seq(20.0), // 20x — worst, must win the budget
      "qc" -> Seq(3.0))  // 3x
    val prev = Map("qa" -> 1.0, "qb" -> 1.0, "qc" -> 1.0)
    val ((_, repaired), calls) = repairQ(reps, prev, maxRepairs = 1,
      remeasures = Map("qb" -> Seq(1.1)))
    assert(calls === Seq("qb"))
    assert(repaired === Seq("qb"))
  }

  test("repairQueries: storm suspects without a prev reference are repaired after ratio suspects") {
    val reps = Seq(
      "qa" -> Seq(5.0, 5.2),   // 5x of prev — quantified suspect
      "qb" -> Seq(3.0, 3.1),   // NO prev entry, every rep storm-flagged
      "qc" -> Seq(0.9, 0.95),  // no prev, storm-flagged, but smaller min
      "qd" -> Seq(0.20, 0.21)) // storm-flagged but under the 0.25s floor
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val (out, repaired) = BenchSupport.repairQueries(
      reps, Map("qa" -> 1.0), 2.0, 0.25, 10,
      stormSuspect = Set("qb", "qc", "qd")) { n =>
      calls += n; Seq(0.5)
    }
    // ratio evidence first, then storm suspects by min desc; floor holds
    assert(calls === Seq("qa", "qb", "qc"))
    assert(repaired === Seq("qa", "qb", "qc"))
    assert(out.toMap.apply("qd") === Seq(0.20, 0.21))
    // a storm-flagged query that HAS a prev reference and is ratio-clean
    // is NOT repaired on load evidence alone — the ratio gate cleared it,
    // and the bounded budget must stay available for unreferenced queries
    val calls1b = scala.collection.mutable.ArrayBuffer[String]()
    val (_, r1b) = BenchSupport.repairQueries(
      Seq("qa" -> Seq(1.1, 1.2)), Map("qa" -> 1.0), 2.0, 0.25, 10,
      stormSuspect = Set("qa")) { n => calls1b += n; Seq(0.5) }
    assert(calls1b === Nil); assert(r1b === Nil)
    // a name that is BOTH ratio- and storm-suspect is repaired once
    val calls2 = scala.collection.mutable.ArrayBuffer[String]()
    val (_, r2) = BenchSupport.repairQueries(
      Seq("qa" -> Seq(5.0)), Map("qa" -> 1.0), 2.0, 0.25, 10,
      stormSuspect = Set("qa")) { n => calls2 += n; Seq(0.5) }
    assert(calls2 === Seq("qa")); assert(r2 === Seq("qa"))
    // the shared budget still caps the union
    val calls3 = scala.collection.mutable.ArrayBuffer[String]()
    BenchSupport.repairQueries(
      Seq("qa" -> Seq(5.0), "qb" -> Seq(3.0)), Map("qa" -> 1.0), 2.0, 0.25, 1,
      stormSuspect = Set("qb")) { n => calls3 += n; Seq(0.5) }
    assert(calls3 === Seq("qa"), "quantified suspect wins a contended budget")
  }

  test("repairQueries: an argmin-load-flagged query is repaired even WITH a clean ratio") {
    // the BENCH_r09 q10 shape: min 4.31 from a load-flagged rep, and the
    // only reference was itself inflated (4.3) so the ratio gate cleared it
    val reps = Seq(
      "qa" -> Seq(7.55, 8.04, 4.31), // argmin rep flagged — must repair
      "qb" -> Seq(0.50, 0.52, 0.49), // argmin flagged but ratio-suspect too
      "qc" -> Seq(0.20, 0.21, 0.19)) // argmin flagged, under the floor
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val (out, repaired) = BenchSupport.repairQueries(
      reps, Map("qa" -> 4.3, "qb" -> 0.1), 2.0, 0.25, 10,
      minFlagged = Set("qa", "qb", "qc")) { n => calls += n; Seq(0.95) }
    // qb enters via the ratio tier (5x of prev, listed once), qa via the
    // argmin tier, qc held by the floor
    assert(calls === Seq("qb", "qa"))
    assert(repaired === Seq("qb", "qa"))
    assert(BenchSupport.minValid(out.toMap.apply("qa")) === 0.95)
    assert(out.toMap.apply("qc") === Seq(0.20, 0.21, 0.19))
    // without the flag, a ratio-clean referenced query is untouched
    val calls2 = scala.collection.mutable.ArrayBuffer[String]()
    val (_, r2) = BenchSupport.repairQueries(
      Seq("qa" -> Seq(7.55, 8.04, 4.31)), Map("qa" -> 4.3), 2.0, 0.25, 10) {
      n => calls2 += n; Seq(0.95) }
    assert(calls2 === Nil); assert(r2 === Nil)
  }

  test("repairQueries: worse re-measure keeps the original min; failed and negative prev never flag") {
    val ((out, _), _) = repairQ(
      Seq("qa" -> Seq(3.0)), Map("qa" -> 1.0),
      remeasures = Map("qa" -> Seq(4.0)))
    assert(BenchSupport.minValid(out.head._2) === 3.0)
    // a failed current rep (-1 min) must not flag; a failed prev (-1) must not either
    val ((_, r2), c2) = repairQ(
      Seq("qa" -> Seq(-1.0), "qb" -> Seq(5.0)),
      Map("qa" -> 1.0, "qb" -> -1.0))
    assert(c2 === Nil); assert(r2 === Nil)
  }

  // ---- flagLoads --------------------------------------------------------

  test("flagLoads: median over valid samples, >factor-x-median flags") {
    // session median 2.0; the 9.0 rep (a storm) flags, the 3.5 does not
    val (m, flags) = BenchSupport.flagLoads(Seq(2.0, 1.8, 9.0, 2.2, 3.5), 2.0)
    assert(m === 2.2 +- 0.001)
    assert(flags === Seq(2))
    // unreadable samples (-1) excluded from the median and never flagged
    val (m2, f2) = BenchSupport.flagLoads(Seq(-1.0, 2.0, 8.0), 2.0)
    assert(m2 === 5.0 +- 0.001)
    assert(f2 === Nil) // 8.0 is not > 2x 5.0
    // no /proc at all: median -1, nothing flags, nothing throws
    assert(BenchSupport.flagLoads(Seq(-1.0, -1.0), 2.0) === ((-1.0, Nil)))
    assert(BenchSupport.flagLoads(Nil, 2.0) === ((-1.0, Nil)))
  }

  test("flagLoads: absolute floor flags storms over a zero median and spares benign reps over a tiny one") {
    // idle host: median 0.0 — the pure-ratio >0 guard used to let a real
    // storm rep (9.0) through unflagged
    val (m0, f0) = BenchSupport.flagLoads(Seq(0.0, 0.0, 9.0, 0.0, 0.0), 2.0)
    assert(m0 === 0.0 +- 0.001)
    assert(f0 === Seq(2))
    // tiny positive median: a rep at load 3 on a 32-CPU box is the bench
    // itself, not a storm — 2x-median alone would over-flag it
    val (_, f1) = BenchSupport.flagLoads(Seq(1.0, 1.1, 3.0, 0.9), 2.0)
    assert(f1 === Nil)
    // the ratio still dominates once the median is real
    val (_, f2) = BenchSupport.flagLoads(Seq(5.0, 5.5, 10.0, 4.8), 2.0)
    assert(f2 === Nil) // 10 < 2x 5.25
    val (_, f3) = BenchSupport.flagLoads(Seq(5.0, 5.5, 29.0, 4.8), 2.0)
    assert(f3 === Seq(2))
  }

  // ---- parseCpuLine / history --------------------------------------------

  test("parseCpuLine: guest jiffies are not double-counted in the total") {
    // user..steal = 100+2+30+800+10+3+5+50 = 1000; the trailing guest
    // fields (40 4) are already inside user and must not inflate the total
    val (t, s) = BenchSupport.parseCpuLine(
      "cpu  100 2 30 800 10 3 5 50 40 4")
    assert(t === 1000L)
    assert(s === 50L)
    // shorter (pre-2.6.11) lines: no steal field → steal 0
    assert(BenchSupport.parseCpuLine("cpu 100 2 30 800") === ((932L, 0L)))
  }

  test("historyReference: last prior-round same-SF entry wins; same-round is the fallback") {
    val hist = Seq(
      """{"round":8,"sf":"/d/sf0.1","queries":{"q01_a":0.5},"total":0.5}""",
      """{"round":9,"sf":"/d/sf0.01","queries":{"q01_a":0.1},"total":0.1}""",
      """{"round":9,"sf":"/d/sf0.1","queries":{"q01_a":0.6,"q02_b":1.5},"total":2.1}""",
      """{"round":10,"sf":"/d/sf0.1","queries":{"q01_a":0.7},"total":0.7}"""
    ).mkString("\n")
    // current round 10: the round-9 sf0.1 entry, not round 10's own run
    // and not the sf0.01 one
    assert(BenchSupport.historyReference(hist, "/d/sf0.1", 10) ===
      Some((9, Map("q01_a" -> 0.6, "q02_b" -> 1.5))))
    // no prior round at this SF: fall back to the same-round entry
    assert(BenchSupport.historyReference(hist, "/d/sf0.01", 9) ===
      Some((9, Map("q01_a" -> 0.1))))
    // a FUTURE round's entry is never a reference: an adjudication re-run
    // of round 8 must not ratio-gate against round 9/10's repaired mins
    assert(BenchSupport.historyReference(hist, "/d/sf0.1", 8) ===
      Some((8, Map("q01_a" -> 0.5))))
    assert(BenchSupport.historyReference(hist, "/d/sf0.1", 7) === None)
    // unknown SF: none
    assert(BenchSupport.historyReference(hist, "/d/sf1.0", 10) === None)
    // corrupt lines are skipped, not fatal
    val dirty = "not json\n" +
      """{"round":3,"sf":"/d/sf0.1","queries":{"q01_a":0.4}}""" + "\n{}"
    assert(BenchSupport.historyReference(dirty, "/d/sf0.1", 10) ===
      Some((3, Map("q01_a" -> 0.4))))
    assert(BenchSupport.historyReference("", "/d/sf0.1", 10) === None)
  }

  test("historyReference: same-round lines merge by per-query min; max prior round wins") {
    val hist = Seq(
      // round 9 ran twice at sf0.1: one clean, one loaded-window — the
      // reference must be the per-query MIN across both, not the last line
      """{"round":9,"sf":"/d/sf0.1","queries":{"q01_a":0.5,"q02_b":1.2},"total":1.7}""",
      """{"round":9,"sf":"/d/sf0.1","queries":{"q01_a":0.9,"q03_c":0.3},"total":1.2}""",
      // a late adjudication re-run of round 8, appended AFTER round 9's
      // lines, must not displace round 9 as round 10's reference
      """{"round":8,"sf":"/d/sf0.1","queries":{"q01_a":0.4},"total":0.4}"""
    ).mkString("\n")
    assert(BenchSupport.historyReference(hist, "/d/sf0.1", 10) ===
      Some((9, Map("q01_a" -> 0.5, "q02_b" -> 1.2, "q03_c" -> 0.3))))
    // pinned back to round 9: prior rounds only → the round-8 re-run
    assert(BenchSupport.historyReference(hist, "/d/sf0.1", 9) ===
      Some((8, Map("q01_a" -> 0.4))))
    // the -1.0 failed-rep sentinel never survives the merge: a clean
    // sibling value wins, and an every-line failure drops the key (the
    // no-reference load-evidence tiers own it) instead of poisoning the
    // p > 0 ratio gate
    val withFail = Seq(
      """{"round":9,"sf":"/d/sf0.1","queries":{"q01_a":-1.0,"q02_b":-1.0},"total":0}""",
      """{"round":9,"sf":"/d/sf0.1","queries":{"q01_a":0.5,"q02_b":-1.0},"total":0.5}"""
    ).mkString("\n")
    assert(BenchSupport.historyReference(withFail, "/d/sf0.1", 10) ===
      Some((9, Map("q01_a" -> 0.5))))
  }

  test("historyMinTotal: same-round lines min-merge with the current run over current keys only") {
    val hist = Seq(
      // this round's earlier official line (one key stormed high, one low)
      """{"round":13,"sf":"/d/sf0.1","queries":{"q01_a":0.5,"q02_b":3.0,"q99_gone":9.9},"total":13.4}""",
      // a DIFFERENT round and a different-SF line: both must be ignored
      """{"round":12,"sf":"/d/sf0.1","queries":{"q01_a":0.1},"total":0.1}""",
      """{"round":13,"sf":"/d/sf0.01","queries":{"q01_a":0.05},"total":0.05}"""
    ).mkString("\n")
    // current run: q01_a stormed (0.9), q02_b clean (1.0); q99_gone was
    // retired from the registry → excluded even though the old line has it
    val cur = Map("q01_a" -> 0.9, "q02_b" -> 1.0)
    assert(math.abs(BenchSupport.historyMinTotal(hist, "/d/sf0.1", 13, cur)
      - 1.5) < 1e-9) // min(0.5,0.9) + min(3.0,1.0)
    // first run of a round (no history yet): equals the run's own total
    assert(math.abs(BenchSupport.historyMinTotal("", "/d/sf0.1", 13, cur)
      - 1.9) < 1e-9)
    // failed-everywhere keys (-1 sentinel) drop out, matching `total`;
    // a key failed THIS run but clean in a sibling line contributes the
    // sibling's value (the representative total is the session best)
    val curFail = Map("q01_a" -> -1.0, "q02_b" -> 1.0)
    assert(math.abs(BenchSupport.historyMinTotal(hist, "/d/sf0.1", 13, curFail)
      - 1.5) < 1e-9) // q01_a from the history line's 0.5
    assert(math.abs(BenchSupport.historyMinTotal("", "/d/sf0.1", 13, curFail)
      - 1.0) < 1e-9)
  }

  test("history lines carrying twin_reps and load_flagged parse to mins only") {
    // round-10 history-line shape: per-rep twin arrays and the per-rep
    // flag table ride along as committed adjudication evidence; neither
    // may leak into the repair-gate mins (rep arrays are "name":[...],
    // flag entries hold the query name as a VALUE — both outside
    // parseArtifactMins' "name":number shape)
    val line =
      """{"round":10,"sf":"/d/sf0.1","queries":{"q01_a":0.5,"q44_t_8m":3.2},""" +
        """"total":3.7,"load_median":2.7,"load_flagged_n":2,"repaired":[],""" +
        """"twin_reps":{"q44_t_8m":[3.308,7.968,3.2]},""" +
        """"load_flagged":[{"q":"q01_a","rep":0,"load":12.3},""" +
        """{"q":"q44_t_8m","rep":1,"load":13.02}],"prev_ref":"h@9"}"""
    assert(BenchSupport.historyReference(line, "/d/sf0.1", 11) ===
      Some((10, Map("q01_a" -> 0.5, "q44_t_8m" -> 3.2))))
  }

  test("flaggedRepOrdinals + argminFlagged: flags map to per-query rep positions") {
    // measurement order: qa pass-1 pair, qb pass-1 pair, qa pass-2, qb pass-2
    val names = Seq("qa", "qa", "qb", "qb", "qa", "qb")
    // flagged log positions 1 (qa's 2nd rep) and 5 (qb's 3rd rep)
    val pairs = BenchSupport.flaggedRepOrdinals(names, Seq(1, 5))
    assert(pairs === Set(("qa", 1), ("qb", 2)))
    // qa's min is its flagged rep 1 → argmin-flagged; qb's min is its
    // clean rep 0 even though its rep 2 was flagged → NOT argmin-flagged
    val reps = Seq(
      "qa" -> Seq(2.0, 1.0, 3.0),
      "qb" -> Seq(0.5, 0.9, 0.4999999999)) // rep 2 flagged AND the min
    assert(BenchSupport.argminFlagged(
      Seq("qa" -> Seq(2.0, 1.0, 3.0), "qb" -> Seq(0.5, 0.9, 0.6)), pairs) ===
      Set("qa"))
    assert(BenchSupport.argminFlagged(reps, pairs) === Set("qa", "qb"))
    // ties break to the FIRST minimal rep (check_bench's min(valid)[1])
    assert(BenchSupport.argminFlagged(
      Seq("qa" -> Seq(1.0, 1.0)), Set(("qa", 1))) === Set.empty)
    // failed reps (-1) are skipped when locating the argmin; all-failed
    // queries never flag
    assert(BenchSupport.argminFlagged(
      Seq("qa" -> Seq(-1.0, 2.0)), Set(("qa", 1))) === Set("qa"))
    assert(BenchSupport.argminFlagged(
      Seq("qa" -> Seq(-1.0, -1.0)), Set(("qa", 0), ("qa", 1))) === Set.empty)
  }

  test("resolveReference: history selection, cross-SF rejection, zero-key rejection") {
    // history text → same selection as historyReference, @N suffix
    val hist =
      """{"round":8,"sf":"/d/sf0.1","queries":{"q01_a":0.5},"total":0.5}""" +
        "\n" +
        """{"round":9,"sf":"/d/sf0.1","queries":{"q01_a":0.6},"total":0.6}"""
    assert(BenchSupport.resolveReference(hist, "/d/sf0.1", 10) ===
      Some((Map("q01_a" -> 0.6), "@9")))
    // history with no same-SF entry: unusable, fall through
    assert(BenchSupport.resolveReference(hist, "/d/sf0.01", 10) === None)
    // plain artifact at the SAME declared SF: accepted
    val art = """{"queries":{"q01_a":0.7},"sf":"/d/sf0.1","value":0.7}"""
    assert(BenchSupport.resolveReference(art, "/d/sf0.1", 10) ===
      Some((Map("q01_a" -> 0.7), "")))
    // plain artifact DECLARING a different SF: rejected — cross-SF mins
    // would burn the bounded repair budget on healthy queries
    assert(BenchSupport.resolveReference(art, "/d/sf0.01", 10) === None)
    // driver wrapper (escaped quotes) keeps its sf declaration readable
    val wrapper =
      """{"n":8,"tail":"\"q01_a\":0.8,\"sf\":\"/d/sf0.1\",\"value\":0.8}"}"""
    assert(BenchSupport.resolveReference(wrapper, "/d/sf0.01", 10) === None)
    assert(BenchSupport.resolveReference(wrapper, "/d/sf0.1", 10) ===
      Some((Map("q01_a" -> 0.8), "")))
    // no sf field at all (old artifact): accepted as-is
    assert(BenchSupport.resolveReference("""{"q01_a":0.9}""", "/d/sf0.1", 10) ===
      Some((Map("q01_a" -> 0.9), "")))
    // readable but zero query keys: unusable (the round-9 silent miss)
    assert(BenchSupport.resolveReference("""{"value":1.0}""", "/d/sf0.1", 10) === None)
  }

  test("preReadDir: walks nested files and survives a missing dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-preread")
    val sub = java.nio.file.Files.createDirectories(dir.resolve("a/b"))
    java.nio.file.Files.writeString(sub.resolve("x.parquet"), "data")
    BenchSupport.preReadDir(dir.toString)      // must not throw
    BenchSupport.preReadDir("/no/such/dir")    // must not throw
  }

  test("shortIds: first segment, full names on collision, always unique") {
    val names = Seq("q00_clean_cast", "q75b_gopher_apply_relaxed",
      "q44_trades_etl", "q44_trades_etl_80k", "q44_trades_etl_800k")
    val ids = BenchSupport.shortIds(names)
    assert(ids("q00_clean_cast") === "q00")
    assert(ids("q75b_gopher_apply_relaxed") === "q75b")
    // the scaled twins collide with the registered q44 → all stay long
    assert(ids("q44_trades_etl") === "q44_trades_etl")
    assert(ids("q44_trades_etl_80k") === "q44_trades_etl_80k")
    assert(ids.values.toSeq.distinct.size === names.size)
    // short ids never match the artifact-min regex, so a compact wrapper
    // line can't inject phantom keys into the repair/check_bench gates
    assert(BenchSupport.parseArtifactMins(""""q75b":0.42""") === Map.empty)
  }

  test("f2: locale-proof two-decimal rendering") {
    assert(BenchSupport.f2(1.2345) === "1.23")
    assert(BenchSupport.f2(0.0) === "0.00")
    assert(BenchSupport.f2(-1.0) === "-1.00")
  }

  test("load and steal probes degrade to sentinels, never throw") {
    // on this Linux host they read real values; the contract under test
    // is "either a plausible reading or the -1 sentinel, never a throw"
    val la = BenchSupport.loadAvg()
    assert(la === -1.0 || la >= 0.0)
    val (t, s) = BenchSupport.cpuJiffies()
    assert((t === -1L && s === -1L) || (t > 0L && s >= 0L && s <= t))
    assert(BenchSupport.stealPct((-1L, -1L), (-1L, -1L)) === -1.0)
    assert(BenchSupport.stealPct((100L, 2L), (100L, 2L)) === -1.0) // no elapsed
    assert(BenchSupport.stealPct((100L, 0L), (200L, 25L)) === 25.0 +- 0.001)
  }
}
