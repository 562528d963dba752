package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** [[SortedVectorMean]] must reproduce the round-14 dim-exploded sorted
  * fold BIT-FOR-BIT: per (group, dim) the values add in vec_id-ascending
  * order and divide by the group count. The spec materializes both
  * formulations over random data with adversarial orderings and compares
  * exact doubles (===, not tolerance).
  */
class SortedVectorMeanSpec extends SparkSpec {

  private def kernelMeans(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g")
      .agg(Bridge.column(SortedVectorMean(Bridge.expression(
        collect_list(struct(col("vec_id"), col("v")))))).as("centroid"))
      .select(col("g"), posexplode(col("centroid")).as(Seq("dim", "cv")))

  private def foldMeans(df: org.apache.spark.sql.DataFrame) =
    df.select(col("g"), col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("g", "dim")
      .agg((aggregate(
        transform(
          array_sort(collect_list(struct(col("vec_id"), col("x")))),
          p => p.getField("x")),
        lit(0.0), (acc, x) => acc + x) / count(lit(1))).as("cv"))

  test("kernel == dim-exploded sorted fold, exact doubles, shuffled input") {
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    // values chosen so add ORDER matters (mixed magnitudes): any order
    // deviation shows up as a bit difference, not an epsilon
    val rows = rnd.shuffle((0 until 300).map { i =>
      (i % 5, i.toLong, Seq.fill(16)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)))
    }).toList
    val df = rows.toDF("g", "vec_id", "v").repartition(7)
    val got = kernelMeans(df).withColumnRenamed("cv", "k")
      .join(foldMeans(df), Seq("g", "dim"))
      .filter(col("k") =!= col("cv"))
    assert(got.count() === 0)
  }

  test("single-member groups return the vector itself") {
    import spark.implicits._
    val df = Seq((1, 10L, Seq(1.5, -2.25, 0.0))).toDF("g", "vec_id", "v")
    val r = kernelMeans(df).orderBy("dim").collect().map(_.getDouble(2)).toSeq
    assert(r === Seq(1.5, -2.25, 0.0))
  }

  test("ragged vectors throw (dense contract)") {
    import spark.implicits._
    val df = Seq((1, 1L, Seq(1.0, 2.0)), (1, 2L, Seq(1.0)))
      .toDF("g", "vec_id", "v")
    val e = intercept[Exception] { kernelMeans(df).collect() }
    assert(e.getMessage != null)
  }
}
