package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("mediaTable wraps text as binary with mime metadata") {
    import spark.implicits._
    val docs = Seq((1L, "hello")).toDF("doc_id", "text")
    val m = Multimodal.mediaTable(docs).head
    assert(m.getAs[String]("mime") === "text/plain")
    assert(m.getAs[Array[Byte]]("bytes").toSeq === "hello".getBytes("UTF-8").toSeq)
  }

  test("extractFeatures computes deterministic byte features per row") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "abcd" * 100)).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(Multimodal.mediaTable(docs))
      .collect().map(r => r.doc_id -> r).toMap
    // single-symbol input: entropy 0, mode = 'a'
    assert(f(1L).n_bytes === Some(4))
    assert(f(1L).entropy === Some(0.0))
    assert(f(1L).mode_byte === Some('a'.toInt))
    // uniform 4-symbol input: entropy = ln(4)
    assert(math.abs(f(2L).entropy.get - math.log(4)) < 1e-12)
    assert(f(2L).sample.get.length === 16)
    // determinism across runs
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(docs))
      .collect().map(r => r.doc_id -> r.entropy).toMap
    assert(again(2L) === f(2L).entropy)
  }

  test("a NULL bytes cell yields NULL features on BOTH paths, not an NPE") {
    import spark.implicits._
    // nullable binary columns come straight from parquet; mediaTable's
    // encode() propagates a NULL text the same way — the mapPartitions
    // path used to NPE in decodeStub while the columnar twin returned NULL
    val docs = Seq((1L, Some("hello")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val media = Multimodal.mediaTable(docs)
    val viaRows = Multimodal.extractFeatures(media)
      .collect().map(r => r.doc_id -> r.n_bytes).toMap
    assert(viaRows === Map(1L -> Some(5), 2L -> None))
    val viaColumnar = Multimodal.extractFeaturesColumnar(media)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(viaColumnar === viaRows)
  }

  test("columnar expression path is bit-identical to mapPartitions") {
    val media = Multimodal.mediaTable(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_bytes", "entropy", "mode_byte", "sample")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3),
        r.getAs[Array[Byte]](4).toSeq))
      .sortBy(_._1)
    val viaRows     = snap(Multimodal.extractFeatures(media).toDF())
    val viaColumnar = snap(Multimodal.extractFeaturesColumnar(media))
    assert(viaRows.length === 500)
    assert(viaRows === viaColumnar) // entropy compared as exact doubles
  }

  test("columnar path stays inside whole-stage codegen") {
    val media = Multimodal.mediaTable(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val plan = Multimodal.extractFeaturesColumnar(media)
      .queryExecution.executedPlan.toString
    // `*(n)` prefixes mark WholeStageCodegen spans in simple-mode plans
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("DeserializeToObject"), plan) // no object round-trip
  }
}
