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
    for (q <- Seq("q22_neardup_pairs", "q23_jaccard", "q27_knn_lsh")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $q (executed, AQE final) =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("simple")))
    }
    spark.stop()
  }
}
