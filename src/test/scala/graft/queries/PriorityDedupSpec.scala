package graft.queries

import graft.SparkSpec
import graft.pipeline.TrainingPipeline
import org.apache.spark.sql.DataFrame

/** Semantics of q76 source-priority canonical election
  * ([[TextQueries.priorityLosersOf]]): a near-dup cluster keeps its
  * best-priority member (doc_id tie-break), min-doc_id only when no
  * member is prioritized; singletons always survive.
  */
class PriorityDedupSpec extends SparkSpec {

  import spark.implicits._

  // Identical texts LSH-collide with certainty (equal signatures), so the
  // cluster structure is fully controlled.
  private val dupA =
    "the fast data query engine runs the big batch join over the wide table"
  private val dupB =
    "a slow stream filter maps the small sorted window into one dense group"
  private def docs: DataFrame = Seq(
    (10L, dupA, "web"),     // cluster A…
    (11L, dupA, "curated"), // …curated member wins despite larger doc_id
    (12L, dupA, "web"),
    (20L, dupB, "web"),     // cluster B: no curated member → min doc_id
    (21L, dupB, "web"),
    (30L, "totally unrelated singleton content with nothing shared here",
      "web"),
  ).toDF("doc_id", "text", "source")

  private val prio = Map("curated" -> 0)

  test("a mixed-provenance cluster keeps the curated member") {
    val losers = TextQueries.priorityLosersOf(docs, prio)
      .collect().map(_.getLong(0)).toSet
    assert(losers === Set(10L, 12L, 21L)) // 11 survives A; 21 loses B; 30 untouched
  }

  test("without priorities the election is min doc_id (q58 semantics)") {
    val losers = TextQueries.priorityLosersOf(docs, Map.empty)
      .collect().map(_.getLong(0)).toSet
    assert(losers === Set(11L, 12L, 21L))
  }

  test("equal priorities tie-break on doc_id") {
    val losers = TextQueries.priorityLosersOf(
        docs, Map("web" -> 0, "curated" -> 0))
      .collect().map(_.getLong(0)).toSet
    assert(losers === Set(11L, 12L, 21L))
  }

  test("TrainingPipeline.export(sourcePriorities) ships the curated survivor") {
    val cfg = TrainingPipeline.Config(minQuality = 0.0)
    val default = TrainingPipeline.export(docs, cfg = cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val curated = TrainingPipeline.export(
        docs, cfg = cfg.copy(sourcePriorities = prio))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(default === Set(10L, 20L, 30L))
    assert(curated === Set(11L, 20L, 30L))
  }

  test("registry q76 runs on the corpus and is oracled") {
    val df = graft.SparkEntry
      .queries("q76_priority_dedup_apply")(spark, "/root/testdata/sf0.001")
    val n = df.count()
    assert(n > 0L && n <= 500L)
    assert(graft.SparkEntry.oracleSql.contains("q76_priority_dedup_apply"))
  }
}
