package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev scratchpad — currently: verify the one-pass q44 Transform reuses the
  * 4-key exchange at runtime (AQE stage reuse): stage/task counts + wall,
  * with and without a smaller CSV split size.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val path = args.lift(0).getOrElse("/root/repo/bench_data/trades_8m.csv")
    val n    = args.lift(1).map(_.toInt).getOrElse(8000000)
    val spark = GraftSession.create("graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")
    graft.etl.TradesGen.ensure(path, n)

    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var cpuNs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
        if (s.stageInfo.taskMetrics != null)
          cpuNs += s.stageInfo.taskMetrics.executorCpuTime
      }
    })

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def pipeline(): Unit =
      noop(graft.etl.Transform(
        graft.etl.TradesEtl.clean(graft.etl.TradesEtl.extract(spark, path)),
        computePnl = true))

    def run(label: String): Unit = (1 to 3).foreach { i =>
      BenchSupport.preRead(path)
      Thread.sleep(200); stages = 0; tasks = 0; cpuNs = 0L
      val la0 = BenchSupport.loadAvg()
      val t0 = System.nanoTime()
      pipeline()
      val wall = (System.nanoTime() - t0) / 1e9
      BenchSupport.clearState(spark); Thread.sleep(200)
      System.err.println(f"[scratch] $label rep=$i wall=$wall%.3f stages=$stages tasks=$tasks cpu=${cpuNs / 1e9}%.2f load=$la0%.2f")
    }

    pipeline(); BenchSupport.clearState(spark) // warm
    run("onepass        ")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    pipeline(); BenchSupport.clearState(spark)
    run("onepass+16m    ")
    spark.stop()
  }
}
