package graft

import org.scalatest.funsuite.AnyFunSuite

/** Verify's GRAFT_VERIFY_ONLY selection (round-12 ADVICE): a misspelled or
  * stale name must not silently select nothing — an empty dump reads as a
  * trivially clean pass during local iteration.
  */
class VerifySpec extends AnyFunSuite {

  test("no GRAFT_VERIFY_ONLY selects the full registry") {
    val sel = Verify.selectQueries(None, _ => fail("no warning expected"))
    assert(sel.keySet === SparkEntry.queries.keySet)
  }

  test("valid names select exactly those queries, no warnings") {
    val names = SparkEntry.queries.keySet.take(3)
    val sel = Verify.selectQueries(Some(names), m => fail(s"unexpected: $m"))
    assert(sel.keySet === names)
  }

  test("unknown names warn but known ones still run") {
    val known = SparkEntry.queries.keySet.take(1)
    val warned = scala.collection.mutable.Buffer.empty[String]
    val sel = Verify.selectQueries(
      Some(known + "q999_no_such_query"), warned += _)
    assert(sel.keySet === known)
    assert(warned.exists(_.contains("q999_no_such_query")))
  }

  test("a selection matching NOTHING fails loudly, never an empty dump") {
    val e = intercept[RuntimeException] {
      Verify.selectQueries(Some(Set("q999_typo")), _ => ())
    }
    assert(e.getMessage.contains("matched no queries"))
    // the empty selection (GRAFT_VERIFY_ONLY="") is the same hazard
    intercept[RuntimeException] {
      Verify.selectQueries(Some(Set.empty[String]), _ => ())
    }
  }
}
