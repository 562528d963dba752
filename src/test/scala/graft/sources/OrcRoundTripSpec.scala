package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ORC is the second first-class columnar format next to parquet: the
  * partitioned layout must round-trip rows exactly and keep both partition
  * pruning and predicate pushdown at the scan.
  */
class OrcRoundTripSpec extends SparkSpec {

  test("date-partitioned ORC round-trips and prunes like parquet") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    Sinks.writeDatePartitioned(events, "ts", dir, format = "orc")

    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("p_date=")), dirs.toSeq)

    val back = spark.read.orc(dir)
    assert(back.count() === events.count())
    // value fidelity through the format, not just counts
    val a = events.select(col("event_id")).collect().map(_.getLong(0)).sorted
    val b = back.select(col("event_id")).collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)

    val firstDay = dirs.map(_.stripPrefix("p_date=")).min
    val q = back.filter(col("p_date") === firstDay)
    val plan = q.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(raw"PartitionFilters: \[[^\]]*p_date".r.findFirstIn(plan).isDefined, plan)
    assert(q.count() > 0 && q.count() < events.count())

    // predicate pushdown reaches the ORC scan too
    val p2 = back.filter(col("user_id") === 7L)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p2.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]"), p2)
  }

  test("compaction handles ORC tables via the format parameter") {
    import spark.implicits._
    val dir  = Files.createTempDirectory("graft_orc_compact").toString
    val path = s"$dir/t"
    val df = (0L until 500L).map(i => (i, s"v$i")).toDF("id", "v")
    df.repartition(8).write.orc(path)
    Sinks.compact(spark, path, numFiles = 1, format = "orc")
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".orc")).toSeq
    assert(files.size === 1)
    assert(spark.read.orc(path).count() === 500)
  }
}
