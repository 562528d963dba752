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

  // Plan-hazard sweep (graft.PlanAudit run as a spec): single-partition
  // exchanges, cartesian products, and nested-loop joins are corpus-scale
  // killers UNLESS they provably sit on a tiny side. Every occurrence in
  // the registry is audited and allowlisted here with its reason; a new
  // query (or a regression in an old one) that introduces one fails this
  // sweep and must either fix the plan or justify its entry.
  test("no query has an unaudited single-partition exchange / cartesian / nested-loop join") {
    import org.apache.spark.sql.execution.ExplainMode
    val allowed: Map[String, Set[String]] = Map(
      // broadcast scalar threshold (kth count) + rank over the ≤k winners
      "q07_rank_window" -> Set("Exchange SinglePartition", "BroadcastNestedLoopJoin"),
      // brute-force kNN baseline: query vectors broadcast across the corpus
      "q26_knn_brute" -> Set("BroadcastNestedLoopJoin"),
      // corpus-size scalar (N for idf) broadcast-crossed onto the term table
      "q40_tfidf" -> Set("Exchange SinglePartition", "BroadcastNestedLoopJoin"),
      "q42_bm25" -> Set("Exchange SinglePartition", "BroadcastNestedLoopJoin"),
      // same shape as q42: 1-row (N, total_dl) stats aggregate broadcast
      // across the term table
      "q42b_bm25_rational" -> Set("Exchange SinglePartition", "BroadcastNestedLoopJoin"),
      // the intended band join: 4-row interval dim, non-equi predicate
      "q46_range_join" -> Set("BroadcastNestedLoopJoin"),
      // ADC scoring: tiny query/codebook side broadcast across codes
      "q56_knn_pq" -> Set("BroadcastNestedLoopJoin"),
      // same plan as q56 (deterministic-training twin, search shared)
      "q56b_knn_pq_det" -> Set("BroadcastNestedLoopJoin"),
      // the ≤10001-row band table's cumulative window (documented in q87)
      "q87_token_budget" -> Set("Exchange SinglePartition"),
      // merged Misra–Gries sketch (one row) + the n_total window over the
      // ≤k+1-row marked-count aggregate (bounded by construction)
      "q88_heavy_hitters" -> Set("Exchange SinglePartition", "BroadcastNestedLoopJoin"),
      // q89 has no entry: its 256-row weight-table build (which carries a
      // SinglePartition totals aggregate) runs at query CONSTRUCTION — the
      // registered plan is the narrow frozen-weights scoring projection
      // (importanceScoresOf scaladoc documents the construction-time job)
      // the profile IS a global one-row aggregate (that's the operator);
      // partial aggregation happens map-side, the single partition merges
      // #partitions pre-aggregated rows
      "q95_profile" -> Set("Exchange SinglePartition"),
      // single-row funnel summary: the global aggregate IS the output
      "q96_funnel_summary" -> Set("Exchange SinglePartition"))
    val hazards = Seq("Exchange SinglePartition", "CartesianProduct",
      "BroadcastNestedLoopJoin")
    // BOTH modes are swept. skip=true replaces plan-reuse localCheckpoints
    // with identity, so the FULL lineage is visible (advisor round-6
    // finding: the checkpoint truncates the plan and would hide every
    // pre-checkpoint hazard). But production runs the NON-skip plan, and a
    // checkpointed LogicalRDD carries default (huge) size stats, so
    // Catalyst can pick a different physical join downstream of the
    // checkpoint than it picks for the full-lineage plan — the production
    // sweep audits what actually executes there (at the price of the
    // checkpoints' eager jobs, trivial at sf0.001).
    def sweep(skipMaterialize: Boolean): Seq[String] = {
      if (skipMaterialize) spark.conf.set("spark.graft.materialize.skip", "true")
      try SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val p = fn(spark, sf).queryExecution
            .explainString(ExplainMode.fromString("simple"))
          hazards.filter(p.contains)
            .filterNot(allowed.getOrElse(name, Set.empty))
            .map(h => s"$name [skip=$skipMaterialize]: $h")
      } finally if (skipMaterialize) spark.conf.unset("spark.graft.materialize.skip")
    }
    val violations = sweep(skipMaterialize = true) ++ sweep(skipMaterialize = false)
    assert(violations.isEmpty, s"unaudited plan hazards:\n${violations.mkString("\n")}")
  }
}
