package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** stratifiedExactK must reproduce the plain window truth exactly — the
  * two-pass threshold plan is a layout optimization, never a semantics
  * change — including when the threshold pass is sabotaged (safety=0) and
  * every group routes through the shortfall fallback.
  */
class StratifiedExactKSpec extends SparkSpec {

  private lazy val docs: DataFrame =
    graft.Tables.documents(spark, "/root/testdata/sf0.001")

  /** The definitional answer: per-group row_number over the md5 key. */
  private def truth(df: DataFrame, group: String, id: String, k: Int,
      salt: String): Set[(String, Long, Long)] = {
    val key = md5(concat(col(id).cast("string"), lit(salt)))
    val w = Window.partitionBy(group).orderBy(key, col(id))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(group), col(id), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def result(df: DataFrame, k: Int, safety: Int = 4) =
    RelationalOps.stratifiedExactK(df, "lang", "doc_id", k, ":strat", safety)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("equals the window truth on corpus data") {
    assert(result(docs, 20) === truth(docs, "lang", "doc_id", 20, ":strat"))
  }

  test("k larger than every group keeps whole groups, ranked") {
    val got = result(docs, 100000)
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotSizes = got.groupBy(_._1).map { case (l, rs) => l -> rs.size.toLong }
    assert(gotSizes === sizes)
    // ranks are a contiguous 1..n per group
    got.groupBy(_._1).foreach { case (l, rs) =>
      assert(rs.map(_._3) === (1L to sizes(l)).toSet, l)
    }
  }

  test("safety=0 starves the threshold pass; the fallback still lands exact") {
    // threshold ceil(0)=0 keeps (virtually) no survivors → every group is a
    // shortfall group → the result is built entirely by the fallback window
    assert(result(docs, 20, safety = 0) ===
      truth(docs, "lang", "doc_id", 20, ":strat"))
  }

  test("deterministic across runs and repartitioning") {
    val a = result(docs, 10)
    val b = result(docs.repartition(7, col("doc_id")), 10)
    assert(a === b)
  }

  test("groups smaller than k fall back without duplicating rows") {
    import spark.implicits._
    // lang 'xx' has 2 docs (< k=3): min(k, n) guard must not flag it as a
    // shortfall when all 2 rows survive, and must emit exactly 2 rows
    val tiny = Seq((1L, "xx"), (2L, "xx"), (3L, "yy"), (4L, "yy"),
      (5L, "yy"), (6L, "yy")).toDF("doc_id", "lang")
    val got = RelationalOps.stratifiedExactK(tiny, "lang", "doc_id", 3, ":s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth(tiny, "lang", "doc_id", 3, ":s"))
    assert(got.count(_._1 == "xx") === 2)
    assert(got.count(_._1 == "yy") === 3)
  }
}
