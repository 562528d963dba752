package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized through a `noop`
  * write (count() alone would let Catalyst prune the computed columns).
  *
  * Measurement-integrity contract (round-8 fix — the round-7 artifact was
  * polluted by the harness itself and recorded 76.5 s for a pipeline that
  * re-measures at 3.7 s in a clean session):
  *   - the three scaled ETL twins take one rep in the clean session
  *     BEFORE the 99-query loop (the standalone re-measure condition) and
  *     one each midway and at the end, so min-of-3 samples three time
  *     windows of this host's multi-minute ambient-load bursts instead of
  *     letting one window cover the whole twin phase;
  *   - after EVERY run (timed or warmup) all persistent RDDs are
  *     unpersisted and the relation cache cleared — `materialize()`'s
  *     localCheckpoints otherwise pin executor memory across all 99
  *     queries × 3 runs and degrade the later alphabet monotonically;
  *   - every rep is recorded, not just the min: the one-line artifact
  *     carries the twins' rep arrays plus a post-run pinned-RDD count,
  *     and the FULL per-rep table for all queries goes to
  *     `bench_detail.json`, so a stall is visible in the artifact instead
  *     of silently becoming the min.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    import BenchSupport.{arr, f3, minValid, preRead}
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      val elapsed =
        try { fn(spark, dir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          // loud, not silent: a swallowed failure would DROP the query from
          // the headline total, making a runtime regression read as a
          // cross-round speedup with nothing on stderr to diagnose
          System.err.println(
            s"[bench] query failed: ${e.getClass.getName}: ${e.getMessage}")
          -1.0
        }
      // outside the timed span; keeps runs independent (see BenchSupport)
      BenchSupport.clearState(spark)
      elapsed
    }
    // All reps are kept (per-rep visibility); the headline estimator stays
    // min-of-valid-reps — single-run numbers at this scale carry ±20%
    // scheduler/GC noise.
    def repsOf(n: Int, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Seq[Double] = Seq.fill(n)(timeOnce(fn, dir))

    // ---- Scaled baseline twins ------------------------------------------
    // The full reference pipeline on deterministic 100×/1000×/10000×
    // versions of the reference's own dirty CSV — the apples-to-apples
    // numbers against the measured pandas baseline (the 800-row
    // q44_trades_etl measures JVM fixed cost, not the engine). Files are
    // derived state, generated on first use (bench_data/ persists).
    // Each twin gets a DEDICATED untimed warmup run (JIT + codegen + cold
    // page cache) at session start, then one timed rep per ROUND, with an
    // untimed preRead before every run (see BenchSupport.preRead for why).
    //
    // The three rounds are SPREAD across the bench run — one in the clean
    // session before any sf queries, one midway through the query loop,
    // one at the end — because this host's ambient load arrives in
    // multi-minute ~2.5× windows that can cover an entire back-to-back
    // twin phase (observed: every rep of all three twins uniformly
    // inflated, internally consistent, so no plausibility check can catch
    // it from inside). Three time points make min-of-3 sample three
    // windows; state-clearing after every run (rdds_after stays 0) is
    // what makes the mid-run and end reps as valid as the first — and if
    // they ever measure systematically worse, that is residual harness
    // pollution, visible in the artifact's twin_reps.
    val twinSpecs = Seq(
      ("q44_trades_etl_80k", "/root/repo/bench_data/trades_80k.csv", 80000, 3),
      ("q44_trades_etl_800k", "/root/repo/bench_data/trades_800k.csv", 800000, 3),
      ("q44_trades_etl_8m", "/root/repo/bench_data/trades_8m.csv", 8000000, 3))
    def twinRun(path: String) = (s: SparkSession, _: String) =>
      graft.etl.Transform(
        graft.etl.TradesEtl.clean(graft.etl.TradesEtl.extract(s, path)),
        computePnl = true)
    def twinOnce(path: String): Double = {
      preRead(path); timeOnce(twinRun(path), sfDir)
    }
    def measureTwin(path: String, reps: Int): Seq[Double] =
      Seq.fill(reps)(twinOnce(path))
    twinSpecs.foreach { case (_, path, n, _) =>
      graft.etl.TradesGen.ensure(path, n)
      twinOnce(path) // untimed warmup, clean session
    }
    def twinRound(): Seq[Double] =
      twinSpecs.map { case (_, path, _, _) => twinOnce(path) }
    val round1 = twinRound() // clean-session rep, before any sf queries

    // ---- Registered queries (twin rounds 2 and 3 interleaved) ---------
    // JVM/codegen warmup on the smallest SF so per-query times measure the
    // query, not JIT compilation of Spark itself. timeOnce clears state
    // after each, so the warmup loop can't pollute the timed loop either.
    SparkEntry.queries.foreach { case (_, fn) =>
      timeOnce(fn, "/root/testdata/sf0.001")
    }
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    val (firstHalf, secondHalf) = sorted.splitAt(sorted.length / 2)
    val results1 = firstHalf.map { case (name, fn) => (name, repsOf(2, fn, sfDir)) }
    val round2 = twinRound() // mid-run time window
    val results2 = secondHalf.map { case (name, fn) => (name, repsOf(2, fn, sfDir)) }
    val round3 = twinRound() // end-of-run time window
    val results = results1 ++ results2
    val mins = results.map { case (n, rs) => n -> minValid(rs) }

    // Pollution repair — policy in BenchSupport.repairTwins (pure,
    // unit-tested there); the callback re-measures with no warmup (the
    // JVM is hot; preRead still runs per rep).
    val twinFirst = twinSpecs.indices.map(i => Seq(round1(i), round2(i), round3(i)))
    val twinRepsFinal = BenchSupport.repairTwins(twinFirst, 7.0) { i =>
      val (_, path, _, reps) = twinSpecs(i)
      measureTwin(path, reps)
    }
    val twinsRepaired = twinSpecs.map(_._1).zip(twinRepsFinal).map {
      case (name, rs) => (name, minValid(rs), rs)
    }

    // Post-run pollution probe: after clearState() discipline, this must
    // be ~0; a large number here means a query pinned state the harness
    // failed to release, i.e. the artifact may be polluted again.
    val rddsAfter = spark.sparkContext.getPersistentRDDs.size

    // the two interpolated strings (env-controlled path + sf dir) must be
    // JSON-escaped or an unusual value breaks the driver's artifact parse
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    }

    // ONE merged (name → min) list feeds both the stdout line and the
    // detail file, so the two can never desynchronize. total covers the
    // REGISTERED queries only: the scaled-ETL twins are reported per-key
    // but excluded so the headline stays comparable with earlier rounds'
    // BENCH_rNN.json (and q44's pipeline isn't triple-counted).
    val all = mins ++ twinsRepaired.map { case (n, v, _) => n -> v }
    val qs = all.map { case (k, v) => s""""$k":${f3(v)}""" }
      .mkString("{", ",", "}")
    val total = mins.map(_._2).filter(_ >= 0).sum
    // twin rep arrays inline AFTER queries: the tail capture keeps the END
    // of the line, so the headline twins' per-rep evidence survives even
    // when the front of the queries object is truncated.
    val twinReps = twinsRepaired.map { case (n, _, rs) => s""""$n":${arr(rs)}""" }
      .mkString("{", ",", "}")

    // Full per-rep table → side file (the driver tail-captures only the
    // last ~2000 chars of stdout, so the one-line artifact can't carry
    // 99 rep arrays; the detail file makes every rep auditable and is
    // self-contained: reps + the same mins/total as the stdout line).
    val detailPath = sys.env.getOrElse("GRAFT_BENCH_DETAIL",
      "/root/repo/bench_detail.json")
    val detailJson = (results.map { case (n, rs) => s""""$n":${arr(rs)}""" } ++
      twinsRepaired.map { case (n, _, rs) => s""""$n":${arr(rs)}""" })
      .mkString("{\"reps\":{", ",",
        s"""},"queries":$qs,"total":${f3(total)},"rdds_after":$rddsAfter,"sf":"${esc(sfDir)}"}""")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(detailPath), detailJson)
    catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    // metric/value go LAST in the object: the driver tail-captures output,
    // so a front-loaded headline is what gets truncated first on long
    // lines.
    // failed queries are excluded from `total` — surface WHICH, so two
    // rounds' totals are never silently compared over different query
    // sets. REGISTERED queries only: the scaled twins never enter the
    // total, so a failed twin must not cast doubt on it (its own -1
    // stays visible under its key in `queries`).
    val failed = mins.collect { case (k, v) if v < 0 => s""""$k"""" }
      .mkString("[", ",", "]")
    println(
      s"""{"queries":$qs,"twin_reps":$twinReps,"failed":$failed,"rdds_after":$rddsAfter,"detail":"${esc(detailPath)}","sf":"${esc(sfDir)}","unit":"sec","metric":"total_query_sec","value":${f3(total)}}""")
    spark.stop()
  }
}
