package graft.operators

import graft.SparkSpec

class DedupClusteringSpec extends SparkSpec {

  test("connected components merge transitively linked pairs") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L),
    ).toDF("doc_a", "doc_b")
    val cc = DedupClustering.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("a long chain converges (diameter > 1 iteration)") {
    import spark.implicits._
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = DedupClustering.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet === Set(1L))
    assert(cc.size === 10)
  }
}
