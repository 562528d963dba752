package graft

import org.apache.spark.sql.SparkSession

/** The measurement plumbing shared by the bench mains ([[Bench]],
  * [[BenchOne]], [[graft.etl.BenchScaled]]) — one copy, so the
  * state-clearing and formatting semantics cannot drift between the
  * official harness and the standalone adjudication tools.
  */
object BenchSupport {

  /** Drop whatever a run pinned: `materialize()`'s localCheckpoint blocks
    * (MEMORY_AND_DISK, only GC-reference-tracked otherwise) and any cached
    * relations. Without this between runs, the round-7 official artifact
    * degraded monotonically through the alphabet — q93 recorded 16.3 s vs
    * 1.2 s standalone.
    */
  def clearState(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }

  /** Touch the whole file untimed before a timed run. This host's virtual
    * disk reads ~32 MB/s cold and its memory reclaim can evict page cache
    * BETWEEN runs of the same process; without the pre-read a 420 MB CSV
    * randomly adds a ~13 s cold read to a ~3 s query. The pandas baseline
    * (`tools/bench_baseline.py`) pre-reads the same way, so warm-cache is
    * the apples-to-apples condition on both sides.
    */
  def preRead(path: String): Unit = {
    val in = new java.io.FileInputStream(path)
    val buf = new Array[Byte](1 << 20)
    try { while (in.read(buf) != -1) () } finally in.close()
  }

  /** [[preRead]] every regular file under `dir`, untimed. The round-9
    * artifact's early-alphabet pairs absorbed the cold-disk first-touch of
    * the sf parquet tables (q10's clean-load pass-1 pair read 7.5/8.0 s vs
    * 0.95 s warm) because only the twin CSVs got a preRead; the SF dir is
    * tens of MB, so warming it before each timed pass costs well under a
    * second warm and removes the 4–6× first-touch inflation cold.
    * Anything unreadable or odd is skipped — a permission quirk must not
    * kill the bench run. walkFileTree does NOT follow directory symlinks
    * (no cycle risk) and only REGULAR files are opened (a FIFO under the
    * data dir would block a read forever).
    */
  def preReadDir(dir: String): Unit =
    try {
      java.nio.file.Files.walkFileTree(java.nio.file.Paths.get(dir),
        new java.nio.file.SimpleFileVisitor[java.nio.file.Path] {
          override def visitFile(p: java.nio.file.Path,
              attrs: java.nio.file.attribute.BasicFileAttributes)
              : java.nio.file.FileVisitResult = {
            if (attrs.isRegularFile)
              try preRead(p.toString) catch { case _: Throwable => () }
            java.nio.file.FileVisitResult.CONTINUE
          }
          override def visitFileFailed(p: java.nio.file.Path,
              e: java.io.IOException): java.nio.file.FileVisitResult =
            java.nio.file.FileVisitResult.CONTINUE
        })
      ()
    } catch { case _: Throwable => () }

  /** Locale.ROOT: a comma-decimal default locale would emit invalid JSON. */
  def f3(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  def arr(rs: Seq[Double]): String = rs.map(f3).mkString("[", ",", "]")

  /** %.2f for the compact wrapper line (see Bench's final println): at 106
    * keys the full-name f3 queries map alone (~2.5 KB) exceeds the
    * driver's ~2 KB stdout tail capture, so that artifact line could never
    * parse; two decimals is still far below bench noise.
    */
  def f2(v: Double): String =
    "%.2f".formatLocal(java.util.Locale.ROOT, v)

  /** Collision-safe short ids for the compact wrapper line: a name maps to
    * its first '_'-segment (the registry's `qNN[letter]` id); any group of
    * names sharing a first segment keeps its full names instead (e.g. the
    * `q44_trades_etl*` scaled twins all collide on `q44` with the
    * registered pipeline query, so all four stay long). Deterministic and
    * total — every input name gets exactly one unique output key.
    */
  def shortIds(names: Seq[String]): Map[String, String] = {
    val first = names.map(n => n -> n.takeWhile(_ != '_'))
    val dup = first.groupBy(_._2).collect {
      case (s, g) if g.size > 1 => s }.toSet
    first.map { case (n, s) => n -> (if (dup(s)) n else s) }.toMap
  }

  /** Min over the VALID reps (-1.0 is the failed-run sentinel): a
    * transient failure on one rep must not discard another's measurement.
    */
  def minValid(reps: Seq[Double]): Double = {
    val ok = reps.filter(_ >= 0)
    if (ok.isEmpty) -1.0 else ok.min
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20).
    * One copy for every hand-built JSON emitter here and in [[Verify]] —
    * a tab or CR in an env-controlled path (GRAFT_BENCH_DETAIL,
    * SPARK_GRAFT_SF_DIR) or builder-authored SQL would otherwise emit an
    * invalid artifact line and silently zero the round.
    */
  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** 1-minute load average from /proc/loadavg; -1.0 where unreadable
    * (non-Linux, permission). Sampled before/after every timed rep so
    * ambient-host-load pollution is adjudicable from the artifact alone —
    * the round-8 official run was inflated ~2.3× by a load storm that a
    * reader could only infer from rep decay.
    */
  def loadAvg(): Double =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Cumulative (total, steal) jiffies from /proc/stat's aggregate "cpu"
    * line; (-1,-1) where unreadable. Steal is field 9 (1-based, after the
    * "cpu" label): user nice system idle iowait irq softirq STEAL. Only
    * the first 8 fields enter the total: the trailing guest/guest_nice
    * fields are already folded into user by the kernel, so summing them
    * would double-count guest time and understate steal% on guest-running
    * hosts.
    */
  def cpuJiffies(): (Long, Long) =
    try parseCpuLine(scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).get)
    catch { case _: Throwable => (-1L, -1L) }

  /** The pure half of [[cpuJiffies]]: (user..steal total, steal) out of a
    * /proc/stat aggregate-cpu line.
    */
  def parseCpuLine(line: String): (Long, Long) = {
    val f = line.trim.split("\\s+").drop(1).map(_.toLong)
    (f.take(8).sum, if (f.length > 7) f(7) else 0L)
  }

  /** Hypervisor steal over a rep as a percent of elapsed CPU time; -1.0
    * when either sample was unreadable or no time elapsed.
    */
  def stealPct(before: (Long, Long), after: (Long, Long)): Double = {
    val (t0, s0) = before; val (t1, s1) = after
    if (t0 < 0 || t1 <= t0) -1.0 else 100.0 * (s1 - s0) / (t1 - t0)
  }

  /** Per-query mins out of any of the three bench-artifact shapes (the
    * full stdout line, bench_detail.json, or the driver's tail-truncated
    * wrapper) — the same regex fallback `tools/check_bench.py` uses, so
    * the in-harness repair gate and the offline gate can never disagree
    * about what the previous round recorded. Matches `"qNN_name":secs`;
    * rep ARRAYS (`"q":[...]`) don't match, so a detail file contributes
    * only its `queries` min section. The driver wrapper embeds the bench
    * line as a JSON STRING VALUE, so its quotes arrive backslash-escaped
    * (`\"q52_vocab\":0.272`) — unescape them first, or the regex matches
    * nothing and the repair gate silently never fires (check_bench.py
    * avoids this by json-parsing the wrapper before its regex pass; the
    * first official round-9 run shipped with this exact miss).
    */
  def parseArtifactMins(text: String): Map[String, Double] =
    "\"(q[0-9]+[a-z]?_[a-z0-9_]+)\":(-?[0-9.]+)".r
      .findAllMatchIn(text.replace("\\\"", "\""))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  /** Parse `tools/bench_history.jsonl` — one line per bench run, appended
    * by [[Bench]] after every run: `{"round":N,"sf":"…","queries":{…all
    * per-query mins…},…}`. This is the committed full-coverage record the
    * truncated driver-wrapper artifacts are not: no BENCH_rNN.json from
    * rounds 5–9 carries q00–q38 (the wrapper stores only a ~2000-char
    * stdout tail), which left the round-9 repair gate blind on exactly the
    * queries that shipped storm-inflated (q10 4.31 s artifact vs 0.95 s
    * clean). Lines that fail to parse are skipped — one corrupt append
    * must not disable the gate for every later round.
    */
  def historyEntries(text: String): Seq[(Int, String, Map[String, Double])] =
    text.linesIterator.filter(_.trim.nonEmpty).flatMap { line =>
      val round = "\"round\":(-?[0-9]+)".r.findFirstMatchIn(line)
        .map(_.group(1).toInt)
      val sf = "\"sf\":\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(line)
        .map(_.group(1))
      (round, sf) match {
        case (Some(r), Some(s)) =>
          val qs = parseArtifactMins(line)
          if (qs.nonEmpty) Some((r, s, qs)) else None
        case _ => None
      }
    }.toSeq

  /** The repair-gate reference out of the history: the HIGHEST same-SF
    * round below the current one, falling back to the SAME round (better
    * than the truncated wrapper, but weaker evidence — gating against the
    * current round's own earlier run, per the round-9 advice on same-round
    * references; the `@N` in the logged reference makes it visible). A
    * FUTURE round's entry is never used: an adjudication re-run of an old
    * round (GRAFT_ROUND pinned back) must not ratio-gate against the next
    * round's repaired, faster mins — and for the same reason the reference
    * round is the MAX prior round, not the last-appended line, so a late
    * re-run of an older round can't displace the true previous round.
    * When the chosen round has several same-SF lines (a round with more
    * than one official run), they merge by per-query MIN: each line's
    * value is already a legitimate hot min-of-reps, so the smallest across
    * runs is the cleanest reference — a reference taken from one
    * loaded-window line would weaken the >2× gate by exactly that line's
    * inflation. `sf` is compared in escaped form because that is how
    * [[Bench]] wrote it. Returns (round, merged queries); None when no
    * eligible entry exists.
    */
  def historyReference(text: String, sf: String,
      currentRound: Int): Option[(Int, Map[String, Double])] = {
    val sameSf = historyEntries(text).filter(_._2 == jsonEscape(sf))
    val targetRound = sameSf.collect {
        case (r, _, _) if r < currentRound => r }.maxOption
      .orElse(sameSf.collect {
        case (r, _, _) if r == currentRound => r }.maxOption)
    targetRound.map { r =>
      // -1.0 is the failed-rep sentinel: without the >= 0 filter one
      // failed run would poison the merged value for a query that has a
      // clean sibling (min(-1, 0.5) = -1), silently disabling the ratio
      // gate for exactly the key that HAD a valid reference. A key that
      // failed in EVERY line drops out entirely — the no-reference
      // load-evidence tiers own it.
      val merged = sameSf.collect { case (`r`, _, qs) => qs }
        .flatten.filter(_._2 >= 0).groupMapReduce(_._1)(_._2)(math.min)
      (r, merged)
    }
  }

  /** The session/history min-merged total published as `history_min_total`
    * in both bench stdout lines (round-12 verdict item 2): the committed
    * BENCH_rNN wrapper is whatever single run the DRIVER happened to
    * snapshot — round 12's landed in an ambient storm (70.6 s face value
    * vs 62.9 s session best) — so the artifact itself must carry the
    * representative number a face-value reader should weigh against the
    * noisy one. Semantics mirror the cross-round gate's min-merge
    * ([[historyReference]] / check_bench's load_artifact): take every
    * same-round same-SF line already in the committed history, merge with
    * THIS run's mins by per-query min, and total over the CURRENT run's
    * registered keys only — `current` gates the key set, so a key retired
    * since an older line can't inflate the total, and twins stay excluded
    * exactly as they are from `total`. Failed keys (-1 everywhere) drop
    * out, matching `total`'s failed-exclusion. First run of a round ⇒
    * equals `total`.
    */
  def historyMinTotal(text: String, sf: String, round: Int,
      current: Map[String, Double]): Double = {
    val sameRound = historyEntries(text).collect {
      case (r, s, qs) if r == round && s == jsonEscape(sf) => qs }
    (sameRound :+ current).flatten
      .filter { case (k, v) => v >= 0 && current.contains(k) }
      .groupMapReduce(_._1)(_._2)(math.min)
      .values.sum
  }

  /** Resolve a reference FILE's text into repair-gate mins — the pure
    * policy behind [[Bench]]'s reference chain, one copy for the pinned
    * (GRAFT_BENCH_PREV) and fallback (newest BENCH_rNN) paths. Returns
    * (mins, suffix-to-append-to-the-logged-path); None means "not a
    * usable reference, fall through", specifically when:
    *   - the text is a history JSONL with no eligible same-SF entry
    *     (regex-parsing it whole would merge every round's and SF's keys,
    *     last-line-wins);
    *   - the artifact DECLARES a different SF — cross-SF mins are not
    *     comparable: an sf0.01 run gated against sf0.1 references would
    *     burn the bounded repair budget on healthy queries, or read a
    *     real regression as a speedup (artifacts old enough to carry no
    *     sf field are accepted as-is);
    *   - zero query keys parse — a wrapper whose tail lost every q-key
    *     would otherwise silently disable the ratio tier for the whole
    *     run, the exact round-9 miss [[parseArtifactMins]] recounts.
    */
  def resolveReference(text: String, sf: String,
      currentRound: Int): Option[(Map[String, Double], String)] =
    if (historyEntries(text).nonEmpty)
      historyReference(text, sf, currentRound).map {
        case (r, qs) => (qs, s"@$r") }
    else {
      val artSf = "\"sf\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findFirstMatchIn(text.replace("\\\"", "\"")).map(_.group(1))
      if (artSf.exists(_ != jsonEscape(sf))) None
      else Some(parseArtifactMins(text)).filter(_.nonEmpty).map((_, ""))
    }

  /** Bounded end-of-run repair for the REGISTERED queries — the round-9
    * counterpart of [[repairTwins]]. A query whose min-of-reps exceeds
    * `factor` × its previous-round artifact value (and an absolute
    * `floorSec`, below which a 2× ratio is scheduler noise — the same
    * 0.25 s floor as `tools/check_bench.py`) is presumed storm-polluted
    * and re-measured once, worst ratio first, at most `maxRepairs`
    * queries per run. Re-measured reps are APPENDED — the estimator stays
    * min-of-all-reps, so a re-measure that comes back worse changes
    * nothing. Returns the updated rep table plus the repaired names (for
    * the artifact's `repaired` field). Pure; [[Bench]] supplies the
    * re-measure callback.
    *
    * `stormSuspect` covers the reference gap: queries with no
    * previous-round value whose EVERY rep was taken at a flagged load
    * would otherwise ship an unrepairable polluted min; they are repaired
    * after the ratio-quantified suspects (worst min first, same `floorSec`
    * floor, same total budget). A storm-flagged query that HAS a reference
    * is deliberately not repaired on all-reps evidence alone — the ratio
    * gate already cleared it, and letting it consume the bounded budget
    * could starve a genuinely unreferenced pollutee.
    *
    * `minFlagged` is the sharper round-10 signal and applies with or
    * WITHOUT a reference: a query whose ARGMIN rep was itself taken at a
    * flagged load has no clean measurement behind its published number —
    * the precise shape BENCH_r09 shipped q00/q07/q10 with (reference gap +
    * every rep stormed, mins 4.5–6× their clean times). These join the
    * storm suspects in the load-evidence tier, deduped against the ratio
    * tier, min-desc within the tier, inside the same budget.
    */
  def repairQueries(reps: Seq[(String, Seq[Double])], prev: Map[String, Double],
      factor: Double, floorSec: Double, maxRepairs: Int,
      stormSuspect: Set[String] = Set.empty,
      minFlagged: Set[String] = Set.empty)(
      remeasure: String => Seq[Double]): (Seq[(String, Seq[Double])], Seq[String]) = {
    val byRatio = reps.flatMap { case (name, rs) =>
      val v = minValid(rs)
      prev.get(name) match {
        case Some(p) if p > 0 && v > factor * p && v > floorSec =>
          Some((name, v / p))
        case _ => None
      }
    }.sortBy(-_._2).map(_._1)
    val ratioSet = byRatio.toSet
    val byLoadEvidence = reps.collect {
      case (name, rs) if !ratioSet(name) && minValid(rs) > floorSec &&
          (minFlagged(name) ||
            (stormSuspect(name) && !prev.get(name).exists(_ > 0))) =>
        (name, minValid(rs))
    }.sortBy(-_._2).map(_._1)
    val suspect = (byRatio ++ byLoadEvidence).take(maxRepairs)
    val extra = suspect.map(n => n -> remeasure(n)).toMap
    (reps.map { case (n, rs) => n -> (rs ++ extra.getOrElse(n, Nil)) }, suspect)
  }

  /** (name, rep-ordinal-within-name) of each flagged entry in an ordered
    * measurement log — the bridge from [[flagLoads]]' positional flags to
    * per-query rep arrays. Ordinals match the rep arrays' order exactly
    * when the log appends in measurement order (pass 1 pair, pass 2,
    * repairs), which [[Bench]]'s loadLog does by construction.
    */
  def flaggedRepOrdinals(names: Seq[String],
      flaggedIdx: Seq[Int]): Set[(String, Int)] =
    flaggedIdx.map { i =>
      (names(i), names.take(i).count(_ == names(i)))
    }.toSet

  /** Queries whose MIN-producing (argmin) rep was load-flagged: the
    * published number has no clean measurement behind it, the precise
    * shape BENCH_r09 shipped q00/q07/q10 with. Ties break to the FIRST
    * minimal rep, matching `tools/check_bench.py`'s `min(valid)[1]`, so
    * the in-run and offline adjudications can never disagree about which
    * rep produced a min. All-failed queries never flag (no min exists).
    */
  def argminFlagged(reps: Seq[(String, Seq[Double])],
      flaggedPairs: Set[(String, Int)]): Set[String] =
    reps.collect {
      case (n, rs) if {
        val valid = rs.zipWithIndex.filter(_._1 >= 0)
        valid.nonEmpty && flaggedPairs((n, valid.minBy(_._1)._2))
      } => n
    }.toSet

  /** Session-median ambient load and the rep indices taken at more than
    * max(`factor` × median, `absFloor`) — the pure half of the artifact's
    * load flagging. The absolute floor fixes both degenerate medians: at
    * median 0.0 (truly idle host) a pure ratio with a >0 guard could never
    * flag a genuine storm rep, and at a tiny positive median 2×-median
    * over-flags benign reps (this host runs the bench itself at loadavg
    * 1–3; real storms record 12–30). Unreadable samples (<0) are excluded
    * from the median and never flagged. An empty/unreadable session
    * medians to -1.0 (nothing flags: without /proc there is no signal).
    */
  def flagLoads(loads: Seq[Double], factor: Double,
      absFloor: Double = 4.0): (Double, Seq[Int]) = {
    val valid = loads.filter(_ >= 0).sorted
    if (valid.isEmpty) (-1.0, Nil)
    else {
      val m =
        if (valid.length % 2 == 1) valid(valid.length / 2)
        else (valid(valid.length / 2 - 1) + valid(valid.length / 2)) / 2.0
      val threshold = math.max(factor * m, absFloor)
      (m, loads.zipWithIndex.collect {
        case (l, i) if l >= 0 && l > threshold => i
      })
    }
  }

  /** Pollution-repair policy for the scaled-twin measurements, pure so it
    * is unit-testable ([[Bench]] supplies the actual re-measure callback).
    *
    * `first` holds each twin's timed reps, ordered smallest→largest input;
    * the twins run the SAME pipeline on 10×-scaled clones, so two readings
    * are physically implausible and mean a host stall polluted every rep
    * of one twin despite warmup + preRead + min-of-N:
    *   (a) a smaller clone's min slower in absolute seconds than a larger
    *       one's, and
    *   (b) the LARGEST twin (which has no larger sibling for check (a))
    *       exceeding `ratioCap` × the next twin's min — six recorded boots
    *       put the clean 800k→8M wall ratio at 3.7–5.7×, so the cap is 7.
    * An implausible twin is re-measured once and its reps appended (the
    * overall min is what's reported); the pass repeats until no twin is
    * implausible or every twin has spent its one re-measure. Iterating
    * matters: repairing the largest twin downward can expose a smaller
    * twin polluted in the same window that the first comparison let
    * through.
    */
  def repairTwins(first: Seq[Seq[Double]], ratioCap: Double)(
      remeasure: Int => Seq[Double]): Seq[Seq[Double]] = {
    def implausible(mins: Seq[Double], i: Int): Boolean = {
      val v = mins(i)
      val larger = mins.drop(i + 1).filter(_ >= 0)
      if (v < 0) false
      else if (larger.nonEmpty) v > larger.min
      else i > 0 && mins(i - 1) > 0 && v > ratioCap * mins(i - 1)
    }
    var reps = first
    val spent = Array.fill(first.length)(false)
    var repairing = true
    while (repairing) {
      val mins = reps.map(minValid)
      first.indices.find(i => !spent(i) && implausible(mins, i)) match {
        case Some(i) =>
          spent(i) = true
          reps = reps.updated(i, reps(i) ++ remeasure(i))
        case None => repairing = false
      }
    }
    reps
  }
}
