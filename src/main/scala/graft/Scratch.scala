package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev scratchpad — currently: same-session A/B of the q44 twin pipeline
  * shapes (old two-pass vs one-pass shared-exchange) with per-stage
  * executor CPU.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val path = args.lift(0).getOrElse("/root/repo/bench_data/trades_8m.csv")
    val n    = args.lift(1).map(_.toInt).getOrElse(8000000)
    val spark = GraftSession.create("graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")
    graft.etl.TradesGen.ensure(path, n)

    val rows = scala.collection.mutable.ArrayBuffer[(Int, Int, Double, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val cpu = Option(i.taskMetrics).map(_.executorCpuTime / 1e9).getOrElse(-1.0)
        val run = Option(i.taskMetrics).map(_.executorRunTime / 1e3).getOrElse(-1.0)
        rows += ((i.stageId, i.numTasks, run, cpu))
      }
    })

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.etl.{TradesEtl, Transform}
    def onepass(): Unit =
      noop(Transform(TradesEtl.clean(TradesEtl.extract(spark, path)),
        computePnl = true))
    def twopass(): Unit = { // the round-14 shape, reconstructed
      val derived = Transform.withDerived(
        TradesEtl.clean(TradesEtl.extract(spark, path)))
      val agg = Transform.weeklyAgg(derived, computePnl = true)
      noop(Transform.withPnl(agg, Transform.markPrice(derived)))
    }

    def run(label: String, f: () => Unit): Unit = {
      f(); BenchSupport.clearState(spark) // warm
      (1 to 3).foreach { i =>
        BenchSupport.preRead(path)
        Thread.sleep(300); rows.clear()
        val t0 = System.nanoTime()
        f()
        val wall = (System.nanoTime() - t0) / 1e9
        BenchSupport.clearState(spark); Thread.sleep(300)
        val cpu = rows.map(_._4).sum
        System.err.println(f"[scratch] $label rep=$i wall=$wall%.3f stages=${rows.size} cpu=$cpu%.2f")
        if (i == 3) rows.toSeq.sortBy(-_._4).foreach { case (id, nt, r, c) =>
          System.err.println(f"[scratch]   stage=$id%4d tasks=$nt%4d run=$r%7.2f cpu=$c%7.2f") }
      }
    }
    run("onepass", onepass _)
    run("twopass", twopass _)
    spark.stop()
  }
}
