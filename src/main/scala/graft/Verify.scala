package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.create("graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Single-file output keeps the driver's per-query compare simple at
    // verification scale (sf≤0.1). For large dumps the one-writer funnel
    // becomes the bottleneck: set GRAFT_VERIFY_SINGLE_FILE=0 to write with
    // the query's natural partitioning instead.
    val singleFile = sys.env.getOrElse("GRAFT_VERIFY_SINGLE_FILE", "1") != "0"
    SparkEntry.queries.foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce collapses the FINAL
      // stage (back to the last shuffle boundary) into one task — narrow
      // queries would run fully single-threaded; repartition keeps every
      // stage parallel and only funnels the result into one output file
      // for the driver's compare.
      // construction INSIDE the try: queries do eager work at build time
      // (Tables.load analysis, materialize()'s localCheckpoint job,
      // argument require()s) — outside it, one failing query would abort
      // the whole dump INCLUDING oracle_sql.json and zero the round
      try {
        val df = fn(spark, sfDir)
        (if (singleFile) df.repartition(1) else df).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
