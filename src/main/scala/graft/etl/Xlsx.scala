package graft.etl

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.collection.mutable.ArrayBuffer

/** Minimal XLSX source/sink with zero external dependencies (SURVEY §2.1
  * S5/S6 — the reference reads/writes Excel via pandas; the offline jar
  * set has no POI, but XLSX is a zip of XML and the JDK ships both zip
  * and StAX).
  *
  * Scope matches the reference's actual use (report-sized spreadsheets):
  * the file format itself is a single non-splittable zip, so parse/build
  * run driver-side; the parsed rows immediately become a distributed
  * DataFrame. Supported: first worksheet, shared + inline strings,
  * numbers. All columns surface as strings (cast downstream), mirroring
  * schema-on-read CSV.
  */
object Xlsx {

  /** Hardened StAX factory: DTDs and external entities OFF — a crafted
    * workbook must not be able to read local files (XXE) or detonate an
    * entity bomb in the driver.
    */
  private def xmlFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  // --------------------------------------------------------------- read

  def read(spark: SparkSession, path: String, header: Boolean = true): DataFrame = {
    val zip = new ZipFile(path.stripPrefix("file:"))
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      // "first sheet" means the workbook's FIRST TAB, not the
      // lowest-numbered part name: part names are never renumbered
      // when sheets are deleted or reordered, so sheet1.xml can be an
      // old secondary sheet while the first visible tab lives in
      // sheet3.xml. Resolve workbook.xml's first <sheet r:id> through
      // the workbook rels; fall back to lowest-numbered part only for
      // workbooks missing either part (minimal writers — incl. ours).
      val sheetRe = "xl/worksheets/sheet(\\d+)\\.xml".r
      def lowestNumberedPart: Option[String] = {
        val en = zip.entries()
        val found = ArrayBuffer.empty[(Int, String)]
        while (en.hasMoreElements) {
          val n = en.nextElement().getName
          n match {
            case sheetRe(num) => found += ((num.toInt, n))
            case _ =>
          }
        }
        found.sortBy(_._1).map(_._2).headOption
      }
      val firstTabPart: Option[String] = for {
        wb <- Option(zip.getEntry("xl/workbook.xml"))
        rid <- firstSheetRelId(zip.getInputStream(wb))
        rels <- Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
        target <- relTarget(zip.getInputStream(rels), rid)
      } yield if (target.startsWith("/")) target.stripPrefix("/")
        else "xl/" + target.stripPrefix("./")
      val sheetEntry = firstTabPart.orElse(lowestNumberedPart).map(zip.getEntry)
        .filter(_ != null)
        .getOrElse(throw new IllegalArgumentException(s"$path: no xl/worksheets/sheetN.xml part"))
      val rows = parseSheet(zip.getInputStream(sheetEntry), shared)
      val width = if (rows.isEmpty) 0 else rows.map(_.length).max
      val padded = rows.map(r => r.padTo(width, null: String))
      val (names, data) =
        if (header && padded.nonEmpty)
          (padded.head.zipWithIndex.map { case (n, i) => Option(n).getOrElse(s"_c$i") }, padded.tail)
        else ((0 until width).map(i => s"_c$i").toArray, padded)
      val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)).toSeq)
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.map(a => Row.fromSeq(a.toSeq)).toSeq),
        schema)
    } finally zip.close()
  }

  private def parseSharedStrings(in: java.io.InputStream): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    val r = xmlFactory().createXMLStreamReader(in)
    var cur: StringBuilder = null
    var inT = false
    // phonetic runs (<rPh><t>furigana</t></rPh>) annotate PRONUNCIATION,
    // not content — appending them corrupts every cell referencing a
    // phonetic-annotated string ("漢字" would surface as "漢字かんじ")
    var inRPh = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "rPh" => inRPh = true
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT && !inRPh && cur != null =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "rPh" => inRPh = false
            case "si" => out += cur.toString; cur = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** r:id of the FIRST <sheet> element in xl/workbook.xml (document
    * order = tab order).
    */
  private def firstSheetRelId(in: java.io.InputStream): Option[String] = {
    val r = xmlFactory().createXMLStreamReader(in)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          var i = 0
          while (i < r.getAttributeCount) {
            if (r.getAttributeLocalName(i) == "id") return Some(r.getAttributeValue(i))
            i += 1
          }
          return None // first sheet has no r:id: malformed, fall back
        }
      }
      None
    } finally r.close()
  }

  /** Target of the relationship with the given Id in a .rels part. */
  private def relTarget(in: java.io.InputStream, rid: String): Option[String] = {
    val r = xmlFactory().createXMLStreamReader(in)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
          var id: String = null; var target: String = null
          var i = 0
          while (i < r.getAttributeCount) {
            r.getAttributeLocalName(i) match {
              case "Id" => id = r.getAttributeValue(i)
              case "Target" => target = r.getAttributeValue(i)
              case _ =>
            }
            i += 1
          }
          if (id == rid) return Option(target)
        }
      }
      None
    } finally r.close()
  }

  /** Column letters of an A1-style ref → 0-based index. */
  private[etl] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def parseSheet(in: java.io.InputStream, shared: IndexedSeq[String]): ArrayBuffer[Array[String]] = {
    val rows = ArrayBuffer.empty[Array[String]]
    val r = xmlFactory().createXMLStreamReader(in)
    var row: ArrayBuffer[(Int, String)] = null
    var cellType = ""
    var cellCol = -1
    var inV = false
    var buf: StringBuilder = null
    var nextCol = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = ArrayBuffer.empty; nextCol = 0
            case "c" =>
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex).getOrElse(nextCol)
            case "v" | "t" => inV = true; buf = new StringBuilder
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV => buf.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" =>
              if (inV && row != null && cellCol >= 0) {
                val raw = buf.toString
                val v = cellType match {
                  case "s" => shared.lift(raw.trim.toInt).orNull
                  case _ => raw
                }
                // rich-text inline strings carry multiple <r><t> runs per
                // cell — concatenate runs instead of keeping only the first
                val existing = row.indexWhere(_._1 == cellCol)
                if (existing >= 0) {
                  val (c0, v0) = row(existing)
                  row(existing) = (c0, Option(v0).getOrElse("") + Option(v).getOrElse(""))
                } else row += (cellCol -> v)
              }
              inV = false
            case "c" => nextCol = cellCol + 1; cellCol = -1
            case "row" =>
              if (row.nonEmpty) {
                val width = row.map(_._1).max + 1
                val arr = new Array[String](width)
                row.foreach { case (i, v) => arr(i) = v }
                rows += arr
              } else rows += Array.empty[String]
              row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows
  }

  // -------------------------------------------------------------- write

  private def escXml(s: String): String = {
    // XML 1.0 allows only #x9 #xA #xD below 0x20 — raw control bytes
    // would make the workbook non-well-formed
    val clean = s.filter(c => c >= ' ' || c == '\t' || c == '\n' || c == '\r')
    clean.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
  }

  /** Write a DataFrame as one .xlsx (inline strings; all values
    * rendered with Spark's string representation). The format is
    * single-file and driver-written by nature, but rows STREAM through
    * `toLocalIterator` into the zip entry — one partition of the
    * limited frame resident at a time, never a row-scale driver array.
    * `maxRows` still bounds total output (a workbook is a report, not
    * a data interchange format; Excel itself caps sheets at ~1M rows);
    * past it the partial file is deleted and the write refuses loudly.
    */
  def write(df: DataFrame, path: String, header: Boolean = true, maxRows: Int = 1000000): Unit = {
    val names = df.columns
    val target = new java.io.File(path.stripPrefix("file:"))
    Option(target.getParentFile).foreach(_.mkdirs()) // match Spark sink behavior
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(target)))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    def rowXml(idx: Int, values: Seq[String]): String =
      s"""<row r="$idx">""" + values.map {
        case null => "<c/>"
        // xml:space="preserve": without it Excel/openpyxl normalize away
        // leading/trailing whitespace on load, corrupting padded values
        case v => s"""<c t="inlineStr"><is><t xml:space="preserve">${escXml(v)}</t></is></c>"""
      }.mkString + "</row>"
    var ok = false
    try {
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.OutputStreamWriter(zos, java.nio.charset.StandardCharsets.UTF_8)
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      var r = 1
      if (header) { w.write(rowXml(r, names.toSeq)); r += 1 }
      // the limit caps what Spark computes; the iterator fetches one
      // partition at a time, so the overflow check fires after at most
      // one partition past the cap, not after a full collect
      val it = df.limit(maxRows + 1).toLocalIterator()
      var n = 0
      while (it.hasNext) {
        val row = it.next()
        n += 1
        if (n > maxRows)
          throw new IllegalArgumentException(
            s"requirement failed: xlsx sink is for report-sized data (> $maxRows rows)")
        w.write(rowXml(r, names.indices.map(i => if (row.isNullAt(i)) null else String.valueOf(row.get(i)))))
        r += 1
      }
      w.write("</sheetData></worksheet>")
      w.flush() // the writer wraps the zip stream: flush, never close
      zos.closeEntry()
      ok = true
    } finally {
      // close in its own guard: on the failure path a close() that
      // itself throws (zip finish on a full disk) must neither mask
      // the original error nor skip the partial-workbook delete; on
      // the success path a close failure is a REAL error (the central
      // directory never landed) — it propagates AND marks the file
      // corrupt, so the delete below removes the truncated workbook
      // instead of leaving it for a reader to trip over
      try zos.close()
      catch { case e: Throwable => if (ok) { ok = false; throw e } }
      // never leave a half-written workbook behind a thrown error
      finally if (!ok) { target.delete(): Unit }
    }
  }
}
