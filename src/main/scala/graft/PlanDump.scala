package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for registered queries to files — the
  * optimization-round evidence trail (plans/rNN/<query>_before|_after.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [query1,query2,...] [sfDir]
  *   - suffix: "before" / "after" (file name becomes <query>_<suffix>.txt)
  *   - no query list (or "all") → every registered query.
  * Explain-only: sets `spark.graft.materialize.skip=true` like PlanAudit so
  * plan-reuse localCheckpoints neither truncate lineage nor run jobs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args.length > 2 && args(2) != "all") args(2).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = GraftSession.create("graft-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.materialize.skip", "true")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query '$name'"))
      val text =
        try fn(spark, sf).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), text)
      println(s"[plan-dump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
