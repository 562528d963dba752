package graft.etl

import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Minimal OOXML `.xlsx` writer — the reference's Excel report sink
  * (`etl_weekly_trades.py:216`, `to_excel(index=False)`) without any
  * spreadsheet library: a `.xlsx` file is a ZIP of ECMA-376 XML parts, and
  * the five-part minimum below (content types, package rels, workbook,
  * workbook rels, one worksheet) is plain public file-format knowledge.
  * Strings are written as inline strings (no sharedStrings part), numbers
  * as native numeric cells, so openpyxl/Excel/LibreOffice read the same
  * rows and columns the reference emits.
  *
  * DRIVER-SIDE BY DESIGN: this is a REPORT sink, like the reference's —
  * the frame is a top-N summary (6 rows in the reference), not a corpus.
  * `maxRows` makes the contract loud instead of letting someone funnel a
  * 100 TB table through a single driver collect; corpus-scale artifacts go
  * through the distributed parquet/CSV/JSONL sinks.
  */
object Xlsx {

  /** Hard cap on collected rows — report-scale only (see scaladoc). */
  val maxRows = 100000

  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    // Excel's sheet-name rules are stricter than XML's: a legal-XML but
    // illegal-Excel name writes a workbook Excel reports as corrupt and
    // repairs by stripping the sheet — fail here instead
    require(sheetName.nonEmpty && sheetName.length <= 31 &&
        !sheetName.exists(":\\/?*[]".contains(_)) &&
        !sheetName.startsWith("'") && !sheetName.endsWith("'"),
      s"invalid Excel sheet name '$sheetName': must be 1-31 chars, no " +
        """: \ / ? * [ ], and not start or end with an apostrophe""")
    // take(cap+1), not count()+collect(): one job, and the driver never
    // materializes more than cap+1 rows even for an over-cap input
    val rows = df.take(maxRows + 1)
    require(rows.length <= maxRows,
      s"Xlsx.write is a report-scale sink (driver-side collect): > " +
        s"$maxRows rows. Use the distributed parquet/CSV/JSONL sinks for large tables.")
    val schema = df.schema

    // Entity-escape, then encode characters XML 1.0 forbids OUTRIGHT
    // (#x00-#x08, #x0B, #x0C, #x0E-#x1F, lone surrogates, #xFFFE/#xFFFF —
    // illegal even as &#N; references) with the OOXML `_xHHHH_` cell
    // convention; a literal `_xHHHH_` in the data gets its underscore
    // escaped as `_x005F_` first so round-tripping is unambiguous. Without
    // this, one stray control byte in a string cell makes the whole
    // workbook unreadable in Excel/openpyxl/LibreOffice.
    // lookahead, NOT a consuming match of the whole _xHHHH_ sequence:
    // adjacent lookalikes SHARE their underscore ("_x0041_x0042_"), and a
    // consuming regex skips the second one, so a reader would decode the
    // unescaped half back to a character — silent corruption. The
    // zero-width lookahead escapes every underscore that starts a
    // lookalike, overlapping or not.
    val xEscLookalike = "_(?=x[0-9A-Fa-f]{4}_)".r
    // a surrogate is legal only inside a well-formed high+low pair (it
    // encodes a supplementary character); lone halves are illegal
    def encodeIllegal(s: String): String = {
      def bad(c: Char) =
        (c < 0x20 && c != '\t' && c != '\n' && c != '\r') ||
          c == 0xFFFE.toChar || c == 0xFFFF.toChar
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isHighSurrogate(c) && i + 1 < s.length &&
            Character.isLowSurrogate(s.charAt(i + 1))) {
          sb.append(c).append(s.charAt(i + 1)); i += 2
        } else if (bad(c) || Character.isSurrogate(c)) {
          sb.append(f"_x${c.toInt}%04X_"); i += 1
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    def esc(s: String): String = {
      val entified = s
        .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\"", "&quot;").replace("'", "&apos;")
        // CR as a character REFERENCE: a literal CR is legal XML but
        // parsers line-end-normalize it to LF, so it would not round-trip.
        // LF and TAB likewise — they survive element content, but esc()
        // also escapes the sheet-name ATTRIBUTE, where attribute-value
        // normalization silently turns both into spaces; the references
        // decode identically in both contexts
        .replace("\r", "&#xD;").replace("\n", "&#xA;").replace("\t", "&#x9;")
      val guarded =
        if (entified.contains("_x"))
          xEscLookalike.replaceAllIn(entified, _ => "_x005F_")
        else entified
      encodeIllegal(guarded)
    }

    // 0-based column index -> A1-style column letters (A..Z, AA..)
    def colLetters(i: Int): String = {
      var nn = i; var s = ""
      while (nn >= 0) { s = ('A' + nn % 26).toChar.toString + s; nn = nn / 26 - 1 }
      s
    }

    def numericCell(ref: String, v: String) = s"""<c r="$ref"><v>$v</v></c>"""
    def strCell(ref: String, v: String) =
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""

    def cell(ref: String, dt: DataType, v: Any): String = (dt, v) match {
      case (_, null) => "" // blank cell: omit entirely
      case (_: ByteType | _: ShortType | _: IntegerType | _: LongType, x) =>
        numericCell(ref, x.toString)
      case (_: FloatType | _: DoubleType, x) =>
        val d = x.toString.toDouble
        // NaN/Inf are not valid OOXML numeric values — surface as text
        if (d.isNaN || d.isInfinite) strCell(ref, d.toString)
        else numericCell(ref, x.toString)
      case (_: DecimalType, x) => numericCell(ref, x.toString)
      case (_: BooleanType, x) =>
        s"""<c r="$ref" t="b"><v>${if (x == true) 1 else 0}</v></c>"""
      // dates/timestamps and anything else: readable text (the reference's
      // report frame is numeric+string only; text keeps this total)
      case (_, x) => strCell(ref, x.toString)
    }

    // (dataType, column letters) hoisted once — the row loop below runs up
    // to maxRows times and must not re-derive either per cell
    val cols = schema.fields.map(_.dataType).zipWithIndex.map {
      case (dt, c) => (dt, colLetters(c))
    }
    // the worksheet is STREAMED to the zip entry row by row (see the
    // publish block below) instead of materialized as one String: at the
    // 100k-row cap with wide string columns a single sheet XML is hundreds
    // of MB, and builder + toString + getBytes would hold ~3x that in
    // driver heap at once
    def writeSheet(w: java.io.Writer): Unit = {
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      w.write("<row r=\"1\">")
      schema.fields.zip(cols).foreach { case (f, (_, letters)) =>
        w.write(strCell(s"${letters}1", f.name))
      }
      w.write("</row>")
      rows.zipWithIndex.foreach { case (row, r) =>
        w.write(s"""<row r="${r + 2}">""")
        cols.zipWithIndex.foreach { case ((dt, letters), c) =>
          w.write(cell(s"$letters${r + 2}", dt, row.get(c)))
        }
        w.write("</row>")
      }
      w.write("</sheetData></worksheet>")
    }

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>"""
    val pkgRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets>""" +
        """</workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>"""

    AtomicFiles.write(path) { tmp =>
      val zos = new ZipOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(tmp)))
      var primary: Throwable = null
      try {
        def part(name: String, content: String): Unit = {
          zos.putNextEntry(new ZipEntry(name))
          zos.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          zos.closeEntry()
        }
        part("[Content_Types].xml", contentTypes)
        part("_rels/.rels", pkgRels)
        part("xl/workbook.xml", workbook)
        part("xl/_rels/workbook.xml.rels", wbRels)
        zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
        val w = new java.io.OutputStreamWriter(zos,
          java.nio.charset.StandardCharsets.UTF_8)
        writeSheet(w)
        w.flush() // flush, don't close: closing the writer closes the zip
        zos.closeEntry()
      } catch { case t: Throwable => primary = t; throw t }
      finally {
        // close() runs finish(), which flushes to the (possibly failed)
        // stream — a throw here must suppress into the primary failure,
        // not replace it as the reported root cause
        try zos.close()
        catch { case c: Throwable =>
          if (primary != null) primary.addSuppressed(c) else throw c }
      }
    }
  }
}
