package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** S7 Excel source — minimal, dependency-free XLSX reader (SURVEY.md §7.4:
  * the usual spark-excel/POI stack can't resolve offline, so the engine
  * ships a built-in fallback covering the standard xlsx shapes: shared
  * strings, inline strings, and numeric cells on the first worksheet).
  *
  * Scale note: xlsx files are driver-parsed by design — the format is a
  * zipped XML workbook that cannot be split, and in the reference's world
  * it carries small curated inputs (lookup/config sheets), not fact data.
  * The resulting DataFrame is distributed like any other; fact-scale data
  * belongs in the splittable formats.
  */
object ExcelSource {

  def read(spark: SparkSession, path: String, header: Boolean): DataFrame = {
    val file = {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.isDirectory(p))
        graft.util.Fs.list(p)
          .find(_.toString.toLowerCase.endsWith(".xlsx"))
          .getOrElse(sys.error(s"no .xlsx file under $path")).toString
      else path
    }
    val rows = parseRows(file)
    require(rows.nonEmpty, s"empty worksheet in $file")
    val width = rows.map(_.length).max
    val padded = rows.map(r => r.padTo(width, null: String))
    val (names, data) =
      if (header) (padded.head.zipWithIndex.map { case (c, i) => Option(c).getOrElse(s"_c$i") },
        padded.tail)
      else (Seq.tabulate(width)(i => s"_c$i"), padded)
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(Row(_: _*))), schema)
  }

  /** First worksheet as rows of string cell values (None cells → null). */
  private[sources] def parseRows(file: String): Seq[Seq[String]] = {
    val zip = new ZipFile(file)
    try {
      def doc(name: String): Option[org.w3c.dom.Document] =
        Option(zip.getEntry(name)).map { e =>
          val b = javax.xml.parsers.DocumentBuilderFactory.newInstance()
          b.setNamespaceAware(false)
          b.newDocumentBuilder().parse(zip.getInputStream(e))
        }
      val shared: IndexedSeq[String] = doc("xl/sharedStrings.xml").map { d =>
        val sis = d.getElementsByTagName("si")
        (0 until sis.getLength).map(i => sis.item(i).getTextContent)
      }.getOrElse(IndexedSeq.empty)
      val sheet = doc("xl/worksheets/sheet1.xml")
        .getOrElse(sys.error(s"no xl/worksheets/sheet1.xml in $file"))
      val rowNodes = sheet.getElementsByTagName("row")
      (0 until rowNodes.getLength).map { r =>
        val row = rowNodes.item(r).asInstanceOf[org.w3c.dom.Element]
        val cells = row.getElementsByTagName("c")
        val byCol = (0 until cells.getLength).map { c =>
          val cell = cells.item(c).asInstanceOf[org.w3c.dom.Element]
          val colIdx = colIndex(cell.getAttribute("r"), c)
          val t = cell.getAttribute("t")
          val value = t match {
            case "s" => // shared-string index
              firstTag(cell, "v").map(v => shared(v.trim.toInt)).orNull
            case "inlineStr" => Option(cell.getTextContent).orNull
            case _ => firstTag(cell, "v").orNull // number / formula result / bool
          }
          colIdx -> value
        }
        val width = byCol.map(_._1).maxOption.map(_ + 1).getOrElse(0)
        val arr = new Array[String](width)
        byCol.foreach { case (i, v) => arr(i) = v }
        arr.toSeq
      }
    } finally zip.close()
  }

  private def firstTag(e: org.w3c.dom.Element, tag: String): Option[String] = {
    val ns = e.getElementsByTagName(tag)
    if (ns.getLength == 0) None else Option(ns.item(0).getTextContent)
  }

  /** "B3" → 1; falls back to document order when the ref is absent. */
  private[sources] def colIndex(ref: String, fallback: Int): Int =
    if (ref == null || ref.isEmpty) fallback
    else {
      val letters = ref.takeWhile(_.isLetter)
      if (letters.isEmpty) fallback
      else letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
    }
}
