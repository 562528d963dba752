package graft

/** Every registered query runs at sf0.001 and (where it should) returns
  * rows; oracle keys refer to existing queries. The value-level check is
  * the driver's DuckDB oracle (tools/check_oracle.py locally).
  */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // q12 (anti-join) may legitimately return few rows; q75's combined
  // Gopher filter is legitimately EMPTY on this corpus (the 31-word
  // lexicon has only "the" of Gopher's eight required English words, so
  // every doc fails q71's ≥2-required rule — GopherFilterSpec pins the
  // cause and exercises non-empty keep-sets on planted corpora);
  // everything else >0.
  test("all queries execute at sf0.001") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    val mayBeEmpty =
      Set("q22_neardup_pairs", "q23_jaccard", "q75_gopher_apply")
    val empty = counts.filter { case (n, c) => c == 0 && !mayBeEmpty(n) }
    assert(empty.isEmpty, s"queries with zero rows: ${empty.map(_._1)}")
  }

  test("oracleSql keys are a subset of queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
