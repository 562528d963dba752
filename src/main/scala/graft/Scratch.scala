package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev scratchpad — currently: isolate the per-stage overhead of fanned
  * 32-task stages (trivial projection over the fan-out exchange).
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

    val raw  = Tables.documents(spark, dir)
    def trivialRaw(): Unit = noop(raw.select(col("doc_id")))
    def trivialFan(): Unit = noop(
      graft.operators.Fan.out(raw, col("doc_id")).select(col("doc_id"), length(col("text")).as("l")))
    def kernelFan(): Unit = noop(
      graft.operators.Fan.out(raw, col("doc_id"))
        .select(col("doc_id"), graft.functions.TextOps.tokenCount(col("text")).as("n")))

    def run(label: String, f: () => Unit): Unit = {
      f(); BenchSupport.clearState(spark)
      (1 to 3).foreach { i =>
        Thread.sleep(200); rows.clear()
        val t0 = System.nanoTime()
        f()
        val wall = (System.nanoTime() - t0) / 1e9
        BenchSupport.clearState(spark); Thread.sleep(200)
        System.err.println(f"[scratch] $label rep=$i wall=$wall%.3f cpu=${rows.map(_._4).sum}%.2f run=${rows.map(_._3).sum}%.2f stages=${rows.size}")
        if (i == 3) rows.toSeq.sortBy(-_._3).take(3).foreach { case (id, nt, r, c) =>
          System.err.println(f"[scratch]   stage=$id%4d tasks=$nt%4d run=$r%7.2f cpu=$c%7.2f") }
      }
    }
    run("trivial-raw", trivialRaw _)
    run("trivial-fan", trivialFan _)
    run("kernel-fan ", kernelFan _)
    spark.stop()
  }
}
