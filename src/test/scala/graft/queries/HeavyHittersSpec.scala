package graft.queries

import graft.{SparkSpec, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** q88: exact heavy hitters through the Misra–Gries candidates + exact
  * recount two-phase. The invariant under test: the sketch phase can
  * propose any superset it likes — the OUTPUT must equal the brute-force
  * full-count answer, including when the k-counter budget is far below the
  * distinct-term count (eviction churning) and when the heavy term is
  * spread thin across partitions (no single partition's share dominates).
  */
class HeavyHittersSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q88 equals the brute-force full-count answer on the corpus") {
    val docs = Tables.documents(spark, sf)
    val toks = docs.select(
      explode(TextOps.tokens(TextOps.normalized(col("text")))).as("term"))
    val n = toks.count()
    val expected = toks.groupBy("term").count()
      .filter(col("count") * TextQueries.heavyHittersK > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = TextQueries.heavyHitters(docs)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === expected)
    assert(got.nonEmpty) // the threshold is chosen to bite but not empty
  }

  test("answer stays exact when the counter budget forces constant eviction") {
    import spark.implicits._
    // one partition, 400 distinct background terms + one term at 50%: a
    // 4-counter MG map churns through wipe cycles, yet the union-superset
    // guarantee keeps the heavy term a candidate and the recount is exact
    val words = (0 until 400).map(i => s"w$i")
    val text  = (words ++ Seq.fill(400)("hot")).mkString(" ")
    val docs  = Seq((0L, text)).toDF("doc_id", "text").repartition(1)
    val got = TextQueries.heavyHitters(docs, k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("hot", 400L, 800L)))
  }

  test("heavy term spread thin across partitions is still found") {
    import spark.implicits._
    // every partition sees the heavy term alongside its own fresh noise
    // vocabulary — no partition summary is ever dominated by it, but the
    // per-partition undercount is bounded so the union still contains it
    val docs = (0 until 32).map { p =>
      val noise = (0 until 50).map(i => s"n${p}_$i")
      (p.toLong, (noise ++ Seq.fill(20)("hot")).mkString(" "))
    }.toDF("doc_id", "text").repartition(32)
    // hot: 640 of 2240 tokens = 28.6% > 1/8
    val hh = TextQueries.heavyHitters(docs, k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(hh === Map("hot" -> 640L))
  }
}
