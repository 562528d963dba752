package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.pipeline.TrainingPipeline
import org.apache.spark.sql.functions._

/** Semantics of the q79 PII scrub ([[TextQueries.piiScrubOf]]): the three
  * pattern families on planted fixtures, the sequential-redaction contract
  * (an email swallows its embedded dotted quad), the corpus no-op (the
  * synthetic corpus contains no PII), the registry query's deterministic
  * per-doc seeding, and the TrainingPipeline wiring (redact-first).
  */
class PiiScrubSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def scrub(rows: (Long, String)*) =
    TextQueries.piiScrubOf(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

  test("planted emails, IPs, and both phone formats are counted and redacted") {
    val out = scrub(
      1L -> "contact bob.smith+x@ex-ample.co.uk today",
      2L -> "server 10.0.0.1 and 192.168.255.254 up",
      3L -> "call 555-123-4567 or 555.123.4567 now",
      4L -> "nothing sensitive here at all")
    assert(out(1L) === ((1L, 0L, 0L, "contact <EMAIL> today")))
    assert(out(2L) === ((0L, 2L, 0L, "server <IP> and <IP> up")))
    assert(out(3L) === ((0L, 0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(out(4L) === ((0L, 0L, 0L, "nothing sensitive here at all")))
  }

  test("sequential contract: an email swallows its dotted-quad local part") {
    val out = scrub(1L -> "mail user1.2.3.4@x.com and ip 1.2.3.4")
    assert(out(1L) === ((1L, 1L, 0L, "mail <EMAIL> and ip <IP>")))
  }

  test("raw corpus contains no PII: zero counts, redaction is identity") {
    val docs = Tables.documents(spark, sf)
    val out = TextQueries.piiScrubOf(docs)
    assert(out.filter(!(col("n_emails") <=> lit(0L)) ||
      !(col("n_ipv4") <=> lit(0L)) ||
      !(col("n_phones") <=> lit(0L))).count() === 0L)
    assert(out.join(docs, "doc_id") // null-safe: a NULL redaction must FAIL
      .filter(!(col("text_redacted") <=> col("text"))).count() === 0L)
  }

  test("registry q79 seeds one deterministic PII item of each kind per doc") {
    val q = SparkEntry.queries("q79_pii_scrub")(spark, sf)
    assert(q.filter(!(col("n_emails") <=> lit(1L)) ||
      !(col("n_ipv4") <=> lit(1L)) ||
      !(col("n_phones") <=> lit(1L))).count() === 0L)
    assert(q.count() === Tables.documents(spark, sf).count())
  }

  test("TrainingPipeline piiRedact: export equals export of pre-redacted docs") {
    val body = Seq.tabulate(40)(i => s"tok${i * 7 % 31}word").mkString(" ")
    val docs = Seq(
      (1L, s"$body mail me at alice@ex.com"),
      (2L, s"$body from 10.0.0.1 at 555-123-4567"),
      (3L, body)).toDF("doc_id", "text")
    // the redactor itself rewrites exactly the two planted docs
    val redacted = TextQueries.piiRedactText(docs)
    assert(redacted.filter(col("text").contains("<EMAIL>")).count() === 1L)
    assert(redacted.filter(col("text").contains("<IP>") &&
      col("text").contains("<PHONE>")).count() === 1L)
    val cfg = TrainingPipeline.Config(minQuality = 0.0,
      dedup = TrainingPipeline.NoDedup, piiRedact = true)
    val viaFlag = TrainingPipeline.export(docs, None, cfg)
      .collect().map(_.toSeq).toSet
    val preRedacted = TrainingPipeline.export(redacted, None,
      cfg.copy(piiRedact = false)).collect().map(_.toSeq).toSet
    assert(viaFlag === preRedacted)
    assert(viaFlag.size === 3)
  }
}
