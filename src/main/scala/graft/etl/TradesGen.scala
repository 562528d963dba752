package graft.etl

import java.io.{BufferedWriter, File, FileWriter}

/** Deterministic scaled-trades generator for the three-scale baseline bench
  * (BASELINE.md): reproduces the reference CSV's exact shape and dirt
  * pattern — same header, same 15 users in three client-type blocks, same
  * five symbols with their price levels, `%Y-%m-%d %H:%M:%S` timestamps in
  * the same Jan–Apr 2023 window, and the same ~3.1% dirty-row rate drawn
  * from the reference's observed dirt kinds — `/root/reference/trades (1)
  * (2) (1).csv` has 25 dirty rows per 800 (10 bad timestamps, half empty /
  * half `not_a_date`, + 5 each empty symbol/quantity/price), so a uniform
  * draw over the five kinds at 25/800 reproduces that shape in
  * expectation. Fixed seed → identical bytes every run, so pandas-vs-Spark
  * timings are measured on the same file contents.
  *
  * Key cardinality intentionally does NOT scale with row count: the
  * reference README's scaling discussion (README.md:41-47) is about input
  * volume (100M+ trades), not key growth — the aggregate stays ~1k groups
  * while the input grows 100–1000×, which is exactly the regime where
  * map-side partial aggregation pays.
  */
object TradesGen {

  private val users = Seq(
    (1001L to 1005L, "gold"), (2001L to 2005L, "silver"), (3001L to 3005L, "bronze"))
    .flatMap { case (ids, ct) => ids.map(_ -> ct) }
  private val symbols = Seq(
    "AAPL" -> 157.0, "SPY" -> 411.0, "QQQ" -> 330.0,
    "MSFT" -> 280.0, "GOOGL" -> 2700.0)

  // Locale.ROOT: f"%.2f" under a comma-decimal default locale would emit
  // "5,43" — an extra CSV field per number (same trap Bench guards for its
  // JSON) and a broken byte-determinism contract across machines.
  private def d2(v: Double): String =
    "%.2f".formatLocal(java.util.Locale.ROOT, v)

  /** Write `rows` trades (+header) to `path`. Idempotent on (rows, seed).
    * Writes via temp file + atomic rename so an interrupted run never
    * leaves a truncated file at the final path (which [[ensure]] would
    * then trust forever).
    */
  def generate(path: String, rows: Int, seed: Long = 42L): Unit =
    AtomicFiles.write(path) { tmp =>
    val rnd = new java.util.Random(seed)
    val out = new BufferedWriter(new FileWriter(tmp), 1 << 20)
    try {
      out.write("timestamp,user_id,client_type,symbol,side,quantity,price\n")
      val t0  = java.time.LocalDateTime.of(2023, 1, 1, 0, 0)
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      var i = 0
      while (i < rows) {
        val (uid, ct) = users(rnd.nextInt(users.size))
        val (sym, base) = symbols(rnd.nextInt(symbols.size))
        val side = if (rnd.nextBoolean()) "buy" else "sell"
        var ts   = t0.plusMinutes(rnd.nextInt(90 * 24 * 60).toLong).format(fmt)
        val qty  = d2(1.0 + rnd.nextDouble() * 9.0)
        val prc  = d2(base * (0.95 + rnd.nextDouble() * 0.10))
        var symS = sym; var qtyS = qty; var prcS = prc
        if (rnd.nextDouble() < 25.0 / 800.0) rnd.nextInt(5) match {
          case 0 => ts = ""
          case 1 => ts = "not_a_date"
          case 2 => symS = ""
          case 3 => qtyS = ""
          case 4 => prcS = ""
        }
        out.write(s"$ts,$uid,$ct,$symS,$side,$qtyS,$prcS\n")
        i += 1
      }
    } finally out.close()
  }

  /** Generate only if absent (the file is derived, gitignored state). */
  def ensure(path: String, rows: Int): String = {
    if (!new File(path).exists()) generate(path, rows)
    path
  }

  def main(args: Array[String]): Unit = {
    val Array(path, rows) = args
    generate(path, rows.toInt)
    println(s"wrote $rows rows to $path")
  }
}
