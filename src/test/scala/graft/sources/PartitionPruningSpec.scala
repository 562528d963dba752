package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Date-partitioned layout prunes at planning time: a day-bounded filter
  * must appear in `PartitionFilters` (not as a post-scan filter over all
  * files).
  */
class PartitionPruningSpec extends SparkSpec {

  test("writeDatePartitioned produces a layout that prunes day filters") {
    val dir = Files.createTempDirectory("graft_part").toString
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    Sinks.writeDatePartitioned(events, "ts", dir)

    // hive-style partition directories exist
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("p_date=")), dirs.toSeq)

    val firstDay = dirs.map(_.stripPrefix("p_date=")).min
    val q = spark.read.parquet(dir).filter(col("p_date") === firstDay)
    val plan = q.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"), plan)
    assert(q.count() > 0)
    // pruned scan reads strictly fewer rows than the full table
    assert(q.count() < events.count())
  }
}
