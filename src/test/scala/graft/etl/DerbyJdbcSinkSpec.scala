package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** S2 (the reference's primary sink, `etl_weekly_trades.py:147`
  * `to_sql(if_exists="append")`) exercised against a REAL embedded
  * relational database: Apache Derby ships in `/opt/spark/jars` (with
  * Spark's built-in `DerbyDialect`), so the `jdbcUrl` branch of
  * `Pipeline.runEtl` — written for the SQLite case the offline container
  * cannot host — is proven end-to-end here: table auto-created on first
  * append, re-run doubles rows (`if_exists="append"` parity), contents
  * match the golden 545-row aggregate, nothing falls back to parquet.
  */
class DerbyJdbcSinkSpec extends SparkSpec {

  private val csv = "/root/reference/trades (1) (2) (1).csv"

  test("jdbcUrl appends the aggregate to an embedded Derby database") {
    val out = Files.createTempDirectory("graft-derby").toString
    // derby.system.home (keeps derby.log out of the repo working dir) is
    // set in build.sbt's test javaOptions: it is read ONCE at Derby engine
    // boot, so setting it here would be a no-op if anything else in this
    // JVM booted Derby first, and a global-state leak otherwise
    val db  = s"$out/aggdb"
    val url = s"jdbc:derby:$db;create=true"

    val res = Pipeline.runEtl(spark, csv, out, jdbcUrl = Some(url))
    def readBack() = spark.read.format("jdbc")
      .option("url", s"jdbc:derby:$db")
      .option("dbtable", "agg_trades_weekly")
      .load()

    val first = readBack()
    assert(first.count() === 545)
    // golden spot-check: the database holds the same aggregate the run
    // returned (total volume is the reference pipeline's scalar total)
    val dbTotal = first.agg(org.apache.spark.sql.functions.round(
      org.apache.spark.sql.functions.sum("total_volume"), 6)).first().getDouble(0)
    val resTotal = res.agg.agg(org.apache.spark.sql.functions.round(
      org.apache.spark.sql.functions.sum("total_volume"), 6)).first().getDouble(0)
    assert(dbTotal === resTotal)

    // the reference's if_exists="append": a second run doubles the rows
    Pipeline.runEtl(spark, csv, out, jdbcUrl = Some(url))
    assert(readBack().count() === 1090)

    // JDBC replaced parquet — no parquet table was written
    assert(!new java.io.File(s"$out/agg_trades_weekly").exists)
  }
}
