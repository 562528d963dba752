package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics of the q84 incremental admission dedup
  * ([[TextQueries.incrementalDedup]]): exact copies and near-dups of base
  * docs are refused, novel docs are admitted, and — the contract that
  * separates admission from full dedup — within-batch duplicates are NOT
  * deduped against each other.
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  // disjoint token alphabets per family so distinct bodies never share a
  // shingle (the SplitAssignSpec convention)
  private def body(tag: String) = Seq.tabulate(40)(j => s"$tag$j").mkString(" ")

  test("exact copy refused, near-dup refused, novel admitted, batch self-dups kept") {
    val base = Seq(
      (1L, body("a")), (2L, body("b")), (3L, body("c"))).toDF("doc_id", "text")
    val nearB = body("b").replace("b39", "CHANGED") // 1 token of 40 edited
    val batch = Seq(
      (10L, body("a")),   // exact copy of base 1 → refused
      (11L, nearB),       // near-dup of base 2 → refused (LSH band match)
      (12L, body("z")),   // novel → admitted
      (13L, body("y")),   // within-batch duplicate pair: both admitted —
      (14L, body("y")))   // admission only compares against the BASE
      .toDF("doc_id", "text")
    val kept = TextQueries.incrementalDedup(base, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(12L, 13L, 14L))
  }

  test("q84 on the corpus: admitted set is a subset of the batch slice") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val batchIds = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out = SparkEntry.queries("q84_incremental_dedup")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.subsetOf(batchIds))
    assert(out.nonEmpty)
    // base docs never appear in the admitted output
    assert(out.intersect(
      docs.filter(col("doc_id") % 10 =!= 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet).isEmpty)
  }

  test("an empty batch admits nothing; a batch against an empty base admits all") {
    val base  = Seq((1L, body("a"))).toDF("doc_id", "text")
    val batch = Seq((10L, body("x")), (11L, body("x"))).toDF("doc_id", "text")
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextQueries.incrementalDedup(base, emptyDocs).count() === 0L)
    assert(TextQueries.incrementalDedup(emptyDocs, batch).count() === 2L)
  }
}
