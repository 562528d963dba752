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
    assert(f(1L).n_bytes === 4)
    assert(f(1L).entropy === 0.0)
    assert(f(1L).mode_byte === 'a'.toInt)
    // uniform 4-symbol input: entropy = ln(4)
    assert(math.abs(f(2L).entropy - math.log(4)) < 1e-12)
    assert(f(2L).sample.length === 16)
    // determinism across runs
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(docs))
      .collect().map(r => r.doc_id -> r.entropy).toMap
    assert(again(2L) === f(2L).entropy)
  }
}
