package graft.queries

import graft.SparkSpec

/** q36's sketches are oracle-less (HLL++/KLL internals are engine-specific);
  * bound their error against the exact answers instead.
  */
class ApproxAggSpec extends SparkSpec {

  test("approx distinct count within 10% of exact; median within the exact p40–p60 band") {
    val sf = "/root/testdata/sf0.001"
    val exact = RelationalQueries.queries("q34_distinct_agg")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact quantile band per flag: percentile() is the true rank
    // statistic, so [p40, p60] bounds any sane approx median — a sketch
    // returning e.g. the group max lands far outside it
    import org.apache.spark.sql.functions._
    val bands = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.4)").as("p40"),
        expr("percentile(l_extendedprice, 0.6)").as("p60"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = RelationalQueries.queries("q36_approx_stats")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(approx.nonEmpty)
    approx.foreach { case (flag, nSupp, median) =>
      val e = exact(flag)
      assert(math.abs(nSupp - e).toDouble / e < 0.10, s"$flag: approx=$nSupp exact=$e")
      val (p40, p60) = bands(flag)
      assert(median >= p40 && median <= p60,
        s"$flag: approx median $median outside exact band [$p40, $p60]")
    }
  }
}
