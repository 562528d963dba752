package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    import spark.implicits._
    Seq(text).toDF("t").select(c.as("r")).head.getAs[T]("r")
  }

  test("tokenCount / punctCount / bpeish") {
    assert(one[Int](TextOps.tokenCount(col("t")), "the quick brown fox") === 4)
    assert(one[Int](TextOps.punctCount(col("t")), "a, b. c!") === 3)
    assert(one[Int](TextOps.bpeishTokenCount(col("t")), "abc, def9 x!") === 5)
  }

  test("normalized collapses whitespace and lowercases") {
    assert(one[String](TextOps.normalized(col("t")), "  The\t QUICK\n fox ") === "the quick fox")
  }

  test("langId picks the language with most stopword hits, tie order en>de>es>fr") {
    assert(one[String](TextOps.langId(col("t")), "the cat and the dog is here") === "en")
    assert(one[String](TextOps.langId(col("t")), "der hund und die katze ist da") === "de")
    assert(one[String](TextOps.langId(col("t")), "el perro y la casa es aqui que") === "es")
    assert(one[String](TextOps.langId(col("t")), "le chien et la maison est un") === "fr")
    assert(one[String](TextOps.langId(col("t")), "中文文本") === "zh")
    assert(one[String](TextOps.langId(col("t")), "xyzzy plugh") === "en") // no hits → tie → en
  }

  test("charShingles and wordShingles produce distinct n-grams") {
    assert(one[Seq[String]](TextOps.charShingles(col("t"), 3), "abcabc")
      === Seq("abc", "bca", "cab"))
    assert(one[Seq[String]](TextOps.wordShingles(col("t"), 2), "a b c a b")
      === Seq("a b", "b c", "c a"))
  }

  test("qualityScore is in [0,1] and rewards clean prose") {
    val clean = "the cat sat on the mat and it is a good day in the sun " * 8
    val junk  = "!!! ??? *** ### $$$ %%%"
    val qc = one[Double](TextOps.qualityScore(col("t")), clean)
    val qj = one[Double](TextOps.qualityScore(col("t")), junk)
    assert(qc > 0.6 && qc <= 1.0)
    assert(qj < 0.4 && qj >= 0.0)
  }

  test("fingerprintMd5 is invariant to case and whitespace runs") {
    val a = one[String](TextOps.fingerprintMd5(col("t")), "Hello   World")
    val b = one[String](TextOps.fingerprintMd5(col("t")), "hello world ")
    assert(a === b)
  }

  test("simhash64: identical token arrays hash equal; near texts are close") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 10
    val near = base.replace("lazy", "sleepy")
    val far  = "completely different content about spark aggregation engines " * 10
    val df = Seq(("base", base), ("near", near), ("far", far)).toDF("k", "t")
    val hs = df.select(col("k"),
        TextFingerprints.simhash64(TextOps.tokens(TextOps.normalized(col("t")))).as("h"))
      .as[(String, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs("base"), hs("near")) < ham(hs("base"), hs("far")))
    assert(ham(hs("base"), hs("base")) === 0)
  }

  test("winnow fingerprint: local edit changes few selected hashes") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 10).trim
    val edit = base.replace("jumps", "leaps")
    val df = Seq(("a", base), ("b", edit)).toDF("k", "t")
    val fp = df.select(col("k"),
        TextFingerprints.winnowFingerprint(col("t"), 8, 16).as("f"))
      .as[(String, Seq[String])].collect().toMap
    val inter = fp("a").toSet.intersect(fp("b").toSet).size
    // winnowing guarantee: shared regions → shared fingerprints
    assert(inter.toDouble / fp("a").size > 0.5)
    assert(fp("a") === fp("a").sorted) // sorted, distinct
  }

  test("winnow edge cases: short text, exact window") {
    import spark.implicits._
    val df = Seq("ab", "abcdefgh", "abcdefghi").toDF("t")
    val out = df.select(TextFingerprints.winnowFingerprint(col("t"), 8, 16).as("f"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq.empty) // shorter than k
    assert(out(1).length === 1)  // exactly one k-gram
    assert(out(2).length === 1)  // window covers both k-grams → one min
  }
}
