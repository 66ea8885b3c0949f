package graft.sinks

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** W4 `excel` sink — dependency-free minimal xlsx writer (the mirror of
  * [[graft.sources.ExcelSource]]; the reference's format list includes
  * excel on BOTH ends, /root/reference/spark.json:92).
  *
  * xlsx is a zip of XML parts; this writer emits the five mandatory parts
  * with one worksheet of `inlineStr` cells (no sharedStrings table), which
  * is exactly the subset ExcelSource parses back. Null cells are SKIPPED
  * (with explicit `r` refs keeping later cells aligned) so nulls
  * round-trip as nulls, not empty strings.
  *
  * Scale posture: like W6 singleFile, excel is a curated small-handoff
  * format, not a fact-data sink — the write is a driver-side collect,
  * bounded by the format's own hard row limit (1,048,576 incl. header).
  * Fact-scale data belongs in the splittable formats. */
object ExcelSink {

  private val MaxRows = 1048576

  def write(df: DataFrame, path: String, header: Boolean,
      fileName: String = "part-00000.xlsx"): Unit = {
    val rows = df.collect()
    val nOut = rows.length + (if (header) 1 else 0)
    require(nOut <= MaxRows,
      s"excel sink: $nOut rows exceeds the xlsx limit of $MaxRows — use a splittable format")
    val cols = df.columns

    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }

    def rowXml(rowIdx: Int, cells: Seq[Any]): String = {
      val cs = cells.zipWithIndex.collect {
        case (v, i) if v != null =>
          s"""<c r="${colRef(i)}$rowIdx" t="inlineStr"><is><t>${esc(v.toString)}</t></is></c>"""
      }
      s"""<row r="$rowIdx">${cs.mkString}</row>"""
    }

    val body = new StringBuilder
    var r = 1
    if (header) { body.append(rowXml(r, cols.toSeq)); r += 1 }
    rows.foreach { row => body.append(rowXml(r, row.toSeq)); r += 1 }

    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>$body</sheetData>
           |</worksheet>""".stripMargin
    )

    Files.createDirectories(Paths.get(path))
    val out = new ZipOutputStream(Files.newOutputStream(Paths.get(path, fileName)))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }
}
