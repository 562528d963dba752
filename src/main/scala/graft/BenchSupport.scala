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
}
