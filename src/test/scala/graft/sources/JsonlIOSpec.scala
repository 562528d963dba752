package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}

/** JSONL round-trip, corrupt-line quarantine, and compressed write — the
  * training-corpus interchange path.
  */
class JsonlIOSpec extends SparkSpec {

  private val schema = StructType.fromDDL("doc_id BIGINT, text STRING, lang STRING")

  test("round-trips rows through jsonl, plain and compressed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl").toString
    val df = Seq((1L, "hello world", "en"), (2L, "hola \"mundo\"", "es"),
      (3L, "line\nbreak and \\ slash", "en")).toDF("doc_id", "text", "lang")
    for (codec <- Seq("none", "gzip")) {
      val path = s"$dir/rt_$codec"
      JsonlIO.write(df, path, compression = codec)
      val (clean, quarantine) = JsonlIO.readSplit(spark, path, schema)
      assert(quarantine.count() === 0)
      assert(clean.orderBy("doc_id").collect().toSeq ===
        df.orderBy("doc_id").collect().toSeq)
      if (codec == "gzip")
        assert(Files.list(Paths.get(path)).toArray.map(_.toString)
          .exists(_.endsWith(".json.gz")))
    }
  }

  test("corrupt lines quarantine instead of failing or vanishing") {
    val dir = Files.createTempDirectory("jsonl").toString
    val f = Paths.get(dir, "mixed.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "ok", "lang": "en"}""",
      """{"doc_id": 2, "text": "truncated...""", // malformed JSON
      """not json at all""",
      """{"doc_id": 3, "text": "also ok", "lang": "de"}"""))
    val (clean, quarantine) = JsonlIO.readSplit(spark, dir, schema)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    val bad = quarantine.collect().map(_.getString(0)).toSet
    assert(bad.size === 2)
    assert(bad.exists(_.startsWith("not json")))
  }

  test("type-mismatched fields are corrupt records under the explicit schema") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(Paths.get(dir, "types.jsonl"), java.util.Arrays.asList(
      """{"doc_id": "not_a_number", "text": "x", "lang": "en"}""",
      """{"doc_id": 7, "text": "y", "lang": "fr"}"""))
    val (clean, quarantine) = JsonlIO.readSplit(spark, dir, schema)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet === Set(7L))
    assert(quarantine.count() === 1)
  }

  test("null-struct parses and top-level arrays quarantine; whitespace lines skip") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(Paths.get(dir, "edges.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "ok", "lang": "en"}""",
      "\t",       // tab-only: blank, must be SKIPPED (trim() is space-only)
      "   ",      // space-only blank
      "[]",       // parses to a NULL struct — must quarantine, not an all-null clean row
      // a top-level array: from_json silently keeps only the FIRST element
      """[{"doc_id": 2, "text": "a", "lang": "en"}, {"doc_id": 3, "text": "b", "lang": "de"}]"""))
    val (clean, quarantine) = JsonlIO.readSplit(spark, dir, schema)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    val bad = quarantine.collect().map(_.getString(0)).toSet
    assert(bad === Set("[]",
      """[{"doc_id": 2, "text": "a", "lang": "en"}, {"doc_id": 3, "text": "b", "lang": "de"}]"""))
  }

  test("a UTF-8 BOM on the first line does not quarantine a valid record") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(Paths.get(dir, "bom.jsonl"),
      ("\uFEFF" + """{"doc_id": 9, "text": "bom", "lang": "en"}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (clean, quarantine) = JsonlIO.readSplit(spark, dir, schema)
    assert(quarantine.count() === 0)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("the reserved-column guard is case-insensitive like Spark resolution") {
    val bad = StructType.fromDDL("doc_id BIGINT, _CORRUPT_RECORD STRING")
    val e = intercept[IllegalArgumentException](
      JsonlIO.read(spark, "/nonexistent", bad))
    assert(e.getMessage.contains("reserved"))
  }
}
