package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev scratchpad — currently: A/B the q95 profile aggregate raw vs fanned
  * (same session), per-stage CPU.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")

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
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    def raw(): Unit = noop(graft.operators.RelationalOps.profileColumns(
      Tables.events(spark, dir), cols))
    def fan(): Unit = noop(graft.operators.RelationalOps.profileColumns(
      graft.operators.Fan.out(Tables.events(spark, dir), col("event_id")), cols))

    def run(label: String, f: () => Unit): Unit = {
      f(); BenchSupport.clearState(spark)
      (1 to 3).foreach { i =>
        Thread.sleep(300); rows.clear()
        val t0 = System.nanoTime()
        f()
        val wall = (System.nanoTime() - t0) / 1e9
        BenchSupport.clearState(spark); Thread.sleep(300)
        System.err.println(f"[scratch] $label rep=$i wall=$wall%.3f cpu=${rows.map(_._4).sum}%.2f")
        if (i == 3) rows.toSeq.sortBy(-_._4).take(4).foreach { case (id, nt, r, c) =>
          System.err.println(f"[scratch]   stage=$id%4d tasks=$nt%4d run=$r%7.2f cpu=$c%7.2f") }
      }
    }
    run("raw", raw _)
    run("fan", fan _)
    spark.stop()
  }
}
