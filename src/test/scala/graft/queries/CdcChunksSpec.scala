package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The property that justifies content-defined chunking over fixed-stride
  * chunking (q38): an edit perturbs chunk boundaries only LOCALLY, so most
  * chunk fingerprints of the unedited remainder survive and sub-document
  * dedup still matches them. A fixed-stride chunker shifts every boundary
  * after the edit point, invalidating ~all downstream fingerprints.
  */
class CdcChunksSpec extends SparkSpec {

  private def chunks(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextQueries.cdcChunksOf(rows.toDF("doc_id", "text"))
      .select("doc_id", "chunk_fp")
      .collect().map(r => (r.getLong(0), r.getString(1)))
  }

  test("an insertion near the start preserves most downstream chunk fps") {
    val base   = "the quick brown fox jumps over the lazy dog and runs far away " * 8
    val edited = base.patch(20, "INSERTED TEXT HERE ", 0)
    val fps    = chunks(Seq((1L, base), (2L, edited)))
    val a = fps.collect { case (1L, fp) => fp }
    val b = fps.collect { case (2L, fp) => fp }.toSet
    assert(a.length > 10, s"expected many chunks, got ${a.length}")
    val survived = a.count(b.contains)
    // everything past the edit's local neighborhood re-synchronizes
    assert(survived.toDouble / a.length > 0.6,
      s"only $survived/${a.length} chunk fps survived the edit")
  }

  test("chunk spans tile each document exactly") {
    import spark.implicits._
    val docs = Seq((1L, "some reasonably long text to be chunked " * 5),
      (2L, "short"), (3L, "")).toDF("doc_id", "text")
    val out = TextQueries.cdcChunksOf(docs)
      .groupBy("doc_id")
      .agg(sum("chunk_len").as("covered"), min("chunk_start").as("first"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // chunk lengths sum to the normalized length, starting at 1
    assert(out(1L)._1 === ("some reasonably long text to be chunked " * 5).trim.length)
    assert(out(1L)._2 === 1L)
    assert(out(2L)._1 === 5L) // single short chunk
    assert(!out.contains(3L)) // empty doc emits no rows
  }
}
