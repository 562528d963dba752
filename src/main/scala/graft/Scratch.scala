package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev scratchpad — plan inspection. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q02_week_agg", "q01_cond_agg", "q04_broadcast_join")) {
      val df = SparkEntry.queries(q)(spark, sf)
      println(s"===== $q formatted =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      println(s"===== $q simple =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("simple")))
    }
    val raw   = graft.etl.TradesEtl.extract(spark, "/root/reference/trades (1) (2) (1).csv")
    val agg   = graft.etl.Transform.weeklyAgg(graft.etl.Transform.withDerived(graft.etl.TradesEtl.clean(raw)))
    println("===== trades agg simple =====")
    println(agg.queryExecution.explainString(ExplainMode.fromString("simple")))
    spark.stop()
  }
}
