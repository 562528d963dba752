package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the q77 sub-document exact-substring dedup apply
  * ([[TextQueries.chunkDedupApplyOf]]): chunks partition the normalized
  * text, every duplicated chunk survives exactly once corpus-wide at its
  * (doc_id, chunk_start) argmin, and CDC boundaries make a shared passage
  * dedup away even when its host documents differ elsewhere.
  */
class ChunkDedupSpec extends SparkSpec {

  import spark.implicits._

  private val uniqueA =
    "the quick brown fox jumps over one lazy dog while seventeen sparrows argue about breadcrumbs near the old stone fountain in the market square at dawn"
  private val uniqueB =
    "meanwhile a completely different caravan of merchants counts copper coins under a violet sky as distant thunder rolls across the dry river valley tonight"
  private val passage =
    "this shared passage of considerable length repeats verbatim across documents and therefore its interior chunks must deduplicate to a single canonical occurrence"

  private def run(docs: Seq[(Long, String)]) =
    TextQueries.chunkDedupApplyOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("a unique document reassembles to exactly its normalized text") {
    val rows = run(Seq((1L, uniqueA)))
    val (clean, nKept, nChunks) = rows(1L)
    assert(clean === uniqueA) // already normalized (lowercase, single spaces)
    assert(nKept === nChunks)
  }

  test("an exact duplicate collapses to the empty string") {
    val rows = run(Seq((1L, uniqueA), (2L, uniqueA)))
    assert(rows(1L)._1 === uniqueA) // canonical occurrence keeps everything
    assert(rows(2L) === (("", 0L, rows(1L)._3)))
  }

  test("a shared passage dedups out of the later document") {
    val rows = run(Seq(
      (1L, s"$uniqueA $passage"),
      (2L, s"$uniqueB $passage")))
    val (clean1, k1, c1) = rows(1L)
    val (clean2, k2, c2) = rows(2L)
    assert(clean1 === s"$uniqueA $passage") // doc 1 is canonical throughout
    assert(k1 === c1)
    // doc 2 keeps its unique head but loses the passage's interior chunks
    assert(k2 < c2, s"expected dedup, kept $k2 of $c2")
    assert(clean2.startsWith("meanwhile a completely different"))
    assert(clean2.length < s"$uniqueB $passage".length)
  }

  test("every distinct chunk fingerprint survives exactly once corpus-wide") {
    val docs = Seq(
      (1L, uniqueA), (2L, uniqueA), (3L, uniqueB),
      (4L, s"$uniqueB $passage"), (5L, s"$passage $uniqueA"))
    val distinctFps = TextQueries
      .cdcChunksOf(docs.toDF("doc_id", "text"))
      .select("chunk_fp").distinct().count()
    val totalKept = run(docs).values.map(_._2).sum
    assert(totalKept === distinctFps)
  }

  test("within-document repetition keeps only the first occurrence") {
    val rows = run(Seq((1L, s"$passage $passage")))
    val (_, k, c) = rows(1L)
    assert(k < c, s"expected within-doc dedup, kept $k of $c")
  }

  test("registry q77 runs on the corpus and is oracled") {
    val df = graft.SparkEntry
      .queries("q77_chunk_dedup_apply")(spark, "/root/testdata/sf0.001")
    assert(df.count() === 500L)
    // the corpus-wide invariant holds at sf0.001 too
    val kept = df.agg(sum("n_kept")).collect().head.getLong(0)
    val fps = TextQueries.cdcChunksOf(
        graft.Tables.documents(spark, "/root/testdata/sf0.001"))
      .select("chunk_fp").distinct().count()
    assert(kept === fps)
    assert(graft.SparkEntry.oracleSql.contains("q77_chunk_dedup_apply"))
  }
}
