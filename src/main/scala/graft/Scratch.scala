package graft
import org.apache.spark.sql.functions._

/** Dev scratchpad — currently: CC cost profile for the q58 path at a
  * replication factor (expects a ScaleProbe work dir, see ScaleProbe).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_scaleprobe/f10")
    val spark = GraftSession.create("graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.cc.debug", "true")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[scratch] $label sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }

    val docs = Tables.documents(spark, dir)
    val pairs = graft.queries.TextQueries
      .candidatePairsFrom(graft.queries.TextQueries.sigsFrom(
        graft.queries.TextQueries.shingledDocs(docs)))
    val nPairs = t("pairs.count") { pairs.count() }
    System.err.println(s"[scratch] pairs=$nPairs")
    val cc = t("cc.total") {
      graft.operators.DedupClustering.connectedComponents(pairs)
    }
    val nDocsClustered = t("cc.count") { cc.count() }
    System.err.println(s"[scratch] clustered=$nDocsClustered")
    spark.stop()
  }
}
