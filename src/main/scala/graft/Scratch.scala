package graft
import org.apache.spark.sql.functions._

/** Dev scratchpad — currently: capture EXECUTED (production-mode, AQE
  * final) plans for queries whose registered form materializes a subtree,
  * so the optimization-round evidence shows what actually runs.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q44_trades_etl", "q40_tfidf", "q87_token_budget",
        "q83_decontam_bloom", "q72_dup_passages", "q77_chunk_dedup_apply")
    val sf = "/root/testdata/sf0.001"
    val spark = GraftSession.create("graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      val text = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r15/${name}_after_executed.txt"), text)
      BenchSupport.clearState(spark)
      System.err.println(s"[scratch] wrote plans/r15/${name}_after_executed.txt")
    }
    spark.stop()
  }
}
