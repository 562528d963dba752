package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted skew helpers produce results identical to their plain
  * counterparts (the salt must never change semantics, only layout).
  */
class SkewOpsSpec extends SparkSpec {

  test("saltedEquiJoin equals a plain equi-join") {
    import spark.implicits._
    // 90% of rows share one hot key
    val large = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong else 1L, i.toLong))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "name")

    val plain  = large.join(small, "k").select("k", "v", "name")
    val salted = RelationalOps.saltedEquiJoin(large, small, "k", col("v"), 8)
      .select("k", "v", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedSumAgg equals a plain groupBy sum/count") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (if (i % 100 == 0) "rare" else "hot", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("v_sum"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = RelationalOps.saltedSumAgg(df, Seq("k"), "v", col("v"), 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === plain)
  }
}
