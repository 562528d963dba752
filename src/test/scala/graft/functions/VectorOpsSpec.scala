package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  private def calc(a: Seq[Double], b: Seq[Double], f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Option[Double] = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(f(col("a"), col("b")).as("r"))
      .head match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getDouble(0))
      }
  }

  test("dot product accumulates left-to-right") {
    assert(calc(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), VectorOps.dot) === Some(32.0))
  }

  test("cosine of parallel vectors is 1, orthogonal is 0") {
    assert(math.abs(calc(Seq(1.0, 2.0), Seq(2.0, 4.0), VectorOps.cosine).get - 1.0) < 1e-12)
    assert(math.abs(calc(Seq(1.0, 0.0), Seq(0.0, 1.0), VectorOps.cosine).get) < 1e-12)
  }

  test("cosine with a zero vector is NULL, not NaN") {
    assert(calc(Seq(0.0, 0.0), Seq(1.0, 2.0), VectorOps.cosine) === None)
  }

  test("l2Sq matches the squared euclidean distance") {
    assert(calc(Seq(1.0, 2.0), Seq(4.0, 6.0), VectorOps.l2Sq) === Some(25.0))
  }

  test("native dot/cosine are bit-identical to the HOF formulations on real data") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(2000)
    val diff = pairs.select(
        VectorOps.dot(col("ea"), col("eb")).as("dn"),
        VectorOps.dotHof(col("ea"), col("eb")).as("dh"),
        VectorOps.cosine(col("ea"), col("eb")).as("cn"),
        VectorOps.cosineHof(col("ea"), col("eb")).as("ch"))
      // null-SAFE compare: =!= is NULL when either side is NULL, and the
      // filter would silently drop exactly the rows where a regression
      // made the kernel return NULL (its live zero-norm failure mode)
      .filter(!(col("dn") <=> col("dh")) || !(col("cn") <=> col("ch")))
      .count()
    assert(diff === 0)
  }

  test("native cosine of a zero vector is NULL") {
    assert(calc(Seq(0.0, 0.0), Seq(1.0, 2.0), VectorOps.cosine) === None)
  }

  test("cosine throws on non-finite elements instead of silently yielding NULL") {
    // a NaN input would accumulate NaN norms, which the NaN→NULL zero-norm
    // mapping would silently turn into NULL where the HOF twin propagates
    // NaN — the kernel's contract is to THROW outside its bit-identical
    // domain, matching the ragged/NULL-element guards
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && (c.getCause ne c)) c = c.getCause
      String.valueOf(c.getMessage)
    }
    val e = intercept[Exception] {
      calc(Seq(Double.NaN, 1.0), Seq(1.0, 1.0), VectorOps.cosine)
    }
    assert(rootMsg(e).contains("non-finite"))
    val e2 = intercept[Exception] {
      calc(Seq(Double.MaxValue, Double.MaxValue), Seq(1.0, 1.0), VectorOps.cosine)
    }
    assert(rootMsg(e2).contains("non-finite"))
    // dot propagates NaN unchanged — the HOF does the same, no divergence
    assert(calc(Seq(Double.NaN, 1.0), Seq(1.0, 1.0), VectorOps.dot).exists(_.isNaN))
  }

  test("wrong-typed inputs fail at ANALYSIS with a named type check") {
    // the kernel expressions must reject a mistyped column when the plan
    // is analyzed — not as a ClassCastException (interpreted) or a janino
    // compile error (codegen) inside a running job
    import spark.implicits._
    val df = Seq((1L, "text", Seq("tok"))).toDF("n", "s", "toks")
    def analysisMsg(c: org.apache.spark.sql.Column): String =
      intercept[org.apache.spark.sql.AnalysisException] {
        df.select(c).schema // analysis happens at plan construction
      }.getMessage
    assert(analysisMsg(VectorOps.dot(col("s"), col("s")))
      .contains("array<float>/array<double>"))
    assert(analysisMsg(TextFingerprints.simhash64(col("n")))
      .contains("array<string>"))
    assert(analysisMsg(TextFingerprints.gramRunStats(col("n"), 2))
      .contains("array<string>"))
    assert(analysisMsg(TextFingerprints.winnowFingerprint(col("toks")))
      .contains("string column"))
    assert(analysisMsg(TextFingerprints.cdcCuts(col("n")))
      .contains("string column"))
    // well-typed columns still analyze
    df.select(TextFingerprints.simhash64(col("toks"))).schema
    df.select(VectorOps.dot(typedLit(Seq(1.0)), typedLit(Seq(1.0)))).schema
  }
}
