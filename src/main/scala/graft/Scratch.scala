package graft
import org.apache.spark.sql.functions._

/** Dev scratchpad — A/B fan-out across cheap vs dense documents kernels. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.{TextFingerprints, TextOps}

    def time(label: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      f
      System.err.println(f"[scratch] $label rep=$i sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val raw  = Tables.documents(spark, dir)
    val wide = graft.operators.Fan.out(raw, col("doc_id"))

    // q20 shape: md5-of-normalized + groupBy (cheap kernel, one shuffle)
    def q20(d: org.apache.spark.sql.DataFrame): Unit =
      noop(d.groupBy(TextOps.fingerprintMd5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("cnt")))
    // q18 shape: tokenize + 4 stopword probes (moderate, narrow)
    def q18(d: org.apache.spark.sql.DataFrame): Unit =
      noop(d.select(col("doc_id"), col("text"),
          TextOps.tokens(TextOps.normalized(col("text"))).as("toks"))
        .select(col("doc_id"),
          TextOps.langIdFromTokens(col("toks"), col("text")).as("lang_pred")))
    // q21 shape: shingle + md5 per shingle + 4 minhash (dense, narrow)
    def q21(d: org.apache.spark.sql.DataFrame): Unit =
      noop(graft.queries.TextQueries.sigsFrom(
        graft.queries.TextQueries.shingledDocs(d)))

    for ((nm, f) <- Seq[(String, org.apache.spark.sql.DataFrame => Unit)](
        ("q20", q20), ("q18", q18), ("q21", q21))) {
      f(raw); f(wide)
      time(s"$nm RAW ") { f(raw) }
      time(s"$nm WIDE") { f(wide) }
    }
    spark.stop()
  }
}
