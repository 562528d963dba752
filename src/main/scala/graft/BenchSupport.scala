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

  /** Locale.ROOT: a comma-decimal default locale would emit invalid JSON. */
  def f3(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  def arr(rs: Seq[Double]): String = rs.map(f3).mkString("[", ",", "]")

  /** Min over the VALID reps (-1.0 is the failed-run sentinel): a
    * transient failure on one rep must not discard another's measurement.
    */
  def minValid(reps: Seq[Double]): Double = {
    val ok = reps.filter(_ >= 0)
    if (ok.isEmpty) -1.0 else ok.min
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
