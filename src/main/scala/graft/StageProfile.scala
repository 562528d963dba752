package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage breakdown for ONE registered query: stage name (call site),
  * task count, summed executor run/CPU time. Load-immune like JobCount.
  *
  * Usage: runMain graft.StageProfile <query> [sfDir]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-stageprofile")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    val rows = scala.collection.mutable.ArrayBuffer[(Int, String, Int, Double, Double)]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (record) {
          val i = s.stageInfo
          val cpu = Option(i.taskMetrics).map(_.executorCpuTime / 1e9).getOrElse(-1.0)
          val run = Option(i.taskMetrics).map(_.executorRunTime / 1e3).getOrElse(-1.0)
          val site = i.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("StageProfile"))
            .getOrElse(i.name.linesIterator.next()).trim.take(110)
          rows += ((i.stageId, site, i.numTasks, run, cpu))
        }
    })

    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    BenchSupport.clearState(spark)
    Thread.sleep(200)
    record = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    record = false
    BenchSupport.clearState(spark)
    Thread.sleep(300)
    println(f"STAGEPROFILE $name wall=$wall%.2f")
    rows.sortBy(-_._4).foreach { case (id, nm, nt, run, cpu) =>
      println(f"STAGE id=$id%4d tasks=$nt%4d run=$run%7.2f cpu=$cpu%7.2f  $nm")
    }
    spark.stop()
  }
}
