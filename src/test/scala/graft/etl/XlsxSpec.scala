package graft.etl

import graft.SparkSpec
import java.nio.file.Files
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** S3 — the real `.xlsx` report sink ([[Xlsx]]): write through the
  * pipeline, then read the file back as what it claims to be (a ZIP of
  * OOXML parts, parsed with the JDK's DOM) and compare cell-for-cell with
  * the DataFrame that was written.
  */
class XlsxSpec extends SparkSpec {

  private val csv = "/root/reference/trades (1) (2) (1).csv"

  /** Parse sheet1.xml back into (headers, rows of Option[String]) where
    * numeric cells yield their <v> text and inline-string cells their
    * <t> text; absent cells are None.
    */
  private def readSheet(path: String): (Seq[String], Seq[Seq[Option[String]]]) = {
    val zf = new ZipFile(path)
    try {
      val entries = zf.entries().asScala.map(_.getName).toSet
      // the five-part OOXML minimum must all be present
      assert(Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml")
        .subsetOf(entries), entries.toString)
      val in = zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml"))
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder().parse(in)
      val rowNodes = doc.getElementsByTagName("row")
      // ref like "BC12" -> 0-based column index
      def colIdx(ref: String): Int =
        ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1
      val parsed = (0 until rowNodes.getLength).map { r =>
        val row = rowNodes.item(r).asInstanceOf[org.w3c.dom.Element]
        val cells = row.getElementsByTagName("c")
        (0 until cells.getLength).map { c =>
          val cell = cells.item(c).asInstanceOf[org.w3c.dom.Element]
          colIdx(cell.getAttribute("r")) -> cell.getTextContent
        }.toMap
      }
      val width = parsed.flatMap(_.keys).maxOption.getOrElse(-1) + 1
      val dense = parsed.map(m => (0 until width).map(m.get))
      (dense.head.map(_.getOrElse("")), dense.tail)
    } finally zf.close()
  }

  test("pipeline reportFormat=xlsx writes the 6-row report as real OOXML") {
    val out = Files.createTempDirectory("graft-xlsx").toString
    val res = Pipeline.runEtl(spark, csv, out, reportFormat = "xlsx")
    val path = s"$out/top_clients.xlsx"
    assert(new java.io.File(path).isFile)
    assert(!new java.io.File(s"$out/top_clients").exists) // no CSV fallback

    val (headers, rows) = readSheet(path)
    assert(headers === res.report.columns.toSeq)
    val expected = res.report.collect()
    assert(rows.length === expected.length)
    rows.zip(expected).foreach { case (got, want) =>
      res.report.schema.fields.zipWithIndex.foreach { case (f, i) =>
        f.dataType match {
          case _: org.apache.spark.sql.types.NumericType =>
            assert(got(i).get.toDouble === want.getAs[Any](i).toString.toDouble,
              s"col ${f.name}")
          case _ =>
            assert(got(i).get === want.getAs[Any](i).toString, s"col ${f.name}")
        }
      }
    }
  }

  test("addTimestamp prefixes the xlsx filename like the reference") {
    val out = Files.createTempDirectory("graft-xlsx-ts").toString
    Pipeline.runEtl(spark, csv, out, reportFormat = "xlsx", addTimestamp = true)
    val files = new java.io.File(out).list().toSeq
    assert(files.exists(_.matches(raw"\d{8}_\d{6}_top_clients\.xlsx")), files.toString)
  }

  test("escaping, nulls, NaN and booleans survive the OOXML round-trip") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("d", DoubleType),
      StructField("l", LongType), StructField("b", BooleanType)))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row("""a<b&c>"d'""", 1.5, 7L, true),
        Row(null, Double.NaN, null, false)),
      schema)
    val path = Files.createTempDirectory("graft-xlsx-edge").toString + "/e.xlsx"
    Xlsx.write(df, path)
    val (headers, rows) = readSheet(path)
    assert(headers === Seq("s", "d", "l", "b"))
    assert(rows(0) === Seq(Some("""a<b&c>"d'"""), Some("1.5"), Some("7"), Some("1")))
    // null cells are absent; NaN is not a legal OOXML number -> text
    assert(rows(1) === Seq(None, Some("NaN"), None, Some("0")))
  }

  test("XML-illegal control characters are _xHHHH_-encoded, not emitted raw") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("s", StringType)))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row("a\u0001b\u0008c"), // forbidden even as &#N; in XML 1.0
        Row("keep\ttabs\nand\rCRs"),    // the three LEGAL control chars pass
        Row("_x0041_literal"),          // lookalike: underscore escaped
        Row("emoji 😀 ok"),   // valid surrogate PAIR is legal XML
        Row("_x0041_x0042_")), // ADJACENT lookalikes share an underscore
      schema)
    val path = Files.createTempDirectory("graft-xlsx-ctl").toString + "/c.xlsx"
    Xlsx.write(df, path)
    // the DOM parser accepting the sheet at all is the point of the fix —
    // a raw \u0001 byte makes the whole workbook unparseable
    val (_, rows) = readSheet(path)
    assert(rows(0) === Seq(Some("a_x0001_b_x0008_c")))
    assert(rows(1) === Seq(Some("keep\ttabs\nand\rCRs")))
    assert(rows(2) === Seq(Some("_x005F_x0041_literal")))
    assert(rows(3) === Seq(Some("emoji 😀 ok")))
    // both overlapping lookalikes escaped — a consuming regex would leave
    // "_x0042_" bare and a reader would decode it to "B"
    assert(rows(4) === Seq(Some("_x005F_x0041_x005F_x0042_")))
  }

  test("cell values match the reference's checked-in top_clients.xlsx") {
    // The reference repo ships its openpyxl-written report artifact, which
    // uses the SAME inlineStr/<v> cell forms this writer emits — so one
    // parser reads both and the comparison is artifact-to-artifact: the
    // real Excel file a reference user has on disk vs the one this
    // pipeline writes. Numbers compare at 1e-6: the pnl sums differ from
    // pandas in the last ulps (summation order — the documented
    // float-parity boundary), and formatting differs (Double.toString vs
    // Python repr).
    val out = Files.createTempDirectory("graft-xlsx-golden").toString
    Pipeline.runEtl(spark, csv, out, reportFormat = "xlsx")
    val (refHead, refRows) = readSheet("/root/reference/output/top_clients.xlsx")
    val (gotHead, gotRows) = readSheet(s"$out/top_clients.xlsx")
    assert(gotHead === refHead)
    assert(gotRows.length === refRows.length)
    def canon(rows: Seq[Seq[Option[String]]]): Set[Seq[String]] =
      rows.map(_.zipWithIndex.map { case (v, i) =>
        val s = v.getOrElse("")
        // numeric columns: user_id(0) volume(1) pnl(2) rank(5)
        if (Set(0, 1, 2, 5)(i)) "%.6f".formatLocal(java.util.Locale.ROOT, s.toDouble)
        else s
      }).toSet
    assert(canon(gotRows) === canon(refRows))
  }

  test("the report-scale cap refuses corpus-sized frames loudly") {
    import org.apache.spark.sql.functions._
    val big = spark.range(Xlsx.maxRows + 1L).select(col("id"))
    val e = intercept[IllegalArgumentException] {
      Xlsx.write(big, Files.createTempDirectory("graft-xlsx-cap").toString + "/x.xlsx")
    }
    assert(e.getMessage.contains("report-scale"), e.getMessage)
  }

  test("illegal Excel sheet names are rejected up front, not written corrupt") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(col("id"))
    val dir = Files.createTempDirectory("graft-xlsx-name").toString
    // legal XML, illegal Excel: slash, >31 chars, empty, leading apostrophe
    for (bad <- Seq("2024/Q1", "a" * 32, "", "'quoted")) {
      val e = intercept[IllegalArgumentException](
        Xlsx.write(df, s"$dir/bad.xlsx", bad))
      assert(e.getMessage.contains("sheet name"), s"'$bad': ${e.getMessage}")
    }
    Xlsx.write(df, s"$dir/ok.xlsx", "a" * 31) // boundary: 31 chars is legal
    val (headers, _) = readSheet(s"$dir/ok.xlsx")
    assert(headers === Seq("id"))
  }

  test("tab and newline in cells and sheet name survive attribute normalization") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("s", StringType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row("line1\nline2\tend")), schema)
    val dir = Files.createTempDirectory("graft-xlsx-ws").toString
    Xlsx.write(df, s"$dir/ws.xlsx", "my\nsheet") // legal XML name w/ LF
    // the DOM reader applies standard attribute normalization — character
    // references (&#xA;/&#x9;) survive it; raw LF/TAB would become spaces
    val (_, rows) = readSheet(s"$dir/ws.xlsx")
    assert(rows(0) === Seq(Some("line1\nline2\tend")))
    val wb = new String(readZipEntry(s"$dir/ws.xlsx", "xl/workbook.xml"),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(wb.contains("name=\"my&#xA;sheet\""))
  }

  private def readZipEntry(path: String, entry: String): Array[Byte] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      val in = zf.getInputStream(zf.getEntry(entry))
      try in.readAllBytes() finally in.close()
    } finally zf.close()
  }
}
