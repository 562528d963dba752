package graft

import org.apache.spark.sql.execution.ExplainMode

/** Sweep every registered query's physical plan for scale hazards:
  * single-partition exchanges, cartesian products, nested-loop joins, and
  * unpartitioned windows. Prints one line per (query, hazard) — dev tool
  * feeding the allowlist in QueriesSmokeSpec's plan sweep.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.create("graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    // audit the FULL lineage: plan-reuse localCheckpoints would otherwise
    // truncate the plan (hiding the pre-checkpoint subplan) and eagerly
    // execute a job during this explain-only sweep
    spark.conf.set("spark.graft.materialize.skip", "true")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution
          .explainString(ExplainMode.fromString("simple"))
        val hazards = Seq(
          "Exchange SinglePartition" -> "single-partition exchange",
          "CartesianProduct"         -> "cartesian product",
          "BroadcastNestedLoopJoin"  -> "nested-loop join",
          "Window.*\\[\\]"           -> "unpartitioned window")
          .flatMap { case (pat, label) =>
            val n = pat.r.findAllIn(p).size
            if (n > 0) Some(s"$label x$n") else None
          }
        if (hazards.nonEmpty) println(s"AUDIT $name: ${hazards.mkString(", ")}")
      } catch { case e: Throwable =>
        println(s"AUDIT $name: PLAN FAILED ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
