package graft.sources

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

/** Xlsx SINK — the write side of the workbook surface the reference only
  * reads (`direct/direct_water_prep.py:69-74` consumes hand-downloaded
  * workbooks; round-tripping through this sink puts [[Excel]]'s zip/XML
  * scan on the oracle-checked path). Emits a minimal standards-shaped
  * workbook: workbook.xml + rels + sharedStrings + one XML part per
  * sheet, shared-string cells for text, inline numeric cells for
  * numbers, omitted cells for nulls.
  *
  * SCALE CONTRACT: xlsx is a single-file, driver-side format BY
  * DESIGN — the format's own hard limit is 1,048,576 rows per sheet,
  * i.e. dimension-sized data (the hand-made workbooks the reference
  * ingests). [[sink]] therefore collects the DataFrame and REFUSES
  * anything over the row cap instead of silently truncating; fact-sized
  * data belongs in parquet/CSV sinks. This is the one deliberate
  * driver materialization in the source/sink surface, bounded by the
  * format itself.
  */
object XlsxSink {

  /** The xlsx spec's per-sheet row capacity (2^20), minus the header
    * row [[sink]] writes. */
  val MaxDataRows: Int = 1048575

  private def xml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Write one sheet per (name, grid) pair. Cell conventions: String →
    * shared-string cell, Number → numeric cell, null → cell omitted
    * entirely (not an empty string); anything else → its string form. */
  def write(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    val strings = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int = strings.getOrElseUpdate(s, strings.size)

    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }

    val sheetXmls = sheets.map { case (_, rows) =>
      val body = rows.zipWithIndex.map { case (cells, r) =>
        val cs = cells.zipWithIndex.collect {
          case (v, c) if v != null =>
            val ref = s"${colRef(c)}${r + 1}"
            v match {
              case s: String => s"""<c r="$ref" t="s"><v>${sharedIdx(s)}</v></c>"""
              // boxed primitives and java/scala BigDecimal (a ScalaNumber
              // IS a java.lang.Number) — anything numeric a Row or a
              // literal grid can hold
              case n: java.lang.Number => s"""<c r="$ref"><v>$n</v></c>"""
              case other => s"""<c r="$ref" t="s"><v>${sharedIdx(other.toString)}</v></c>"""
            }
        }.mkString
        s"""<row r="${r + 1}">$cs</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
        .stripMargin
    }

    val workbook = {
      val entries = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${xml(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>$entries</sheets></workbook>""".stripMargin
    }

    val rels = {
      val entries = sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$entries</Relationships>""".stripMargin
    }

    val sst = {
      val sis = strings.keys.map(s => s"<si><t>${xml(s)}</t></si>").mkString
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">$sis</sst>""".stripMargin
    }

    val parent = java.nio.file.Paths.get(path).toAbsolutePath.getParent
    if (parent != null) java.nio.file.Files.createDirectories(parent)
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    // package-level boilerplate so external consumers (Excel,
    // LibreOffice) can locate the workbook part — [[Excel]]'s own reader
    // goes straight to xl/workbook.xml and does not need either
    val contentTypes = {
      val overrides = sheets.indices.map(i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
         |$overrides</Types>""".stripMargin
    }
    val pkgRels =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
         |</Relationships>""".stripMargin

    try {
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", pkgRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", rels)
      put("xl/sharedStrings.xml", sst)
      sheetXmls.zipWithIndex.foreach { case (x, i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", x)
      }
    } finally zos.close()
  }

  /** Sink a DataFrame as one sheet (header row = column names). Numeric
    * columns become numeric cells via Java's shortest round-trip
    * decimal repr — the same exactness argument as [[Csv.sink]]: the
    * string parses back to the identical bit pattern. Refuses more than
    * `maxRows` rows (≤ [[MaxDataRows]], the format's own sheet
    * capacity) — xlsx is for dimension-sized data; the limit+1 fetch
    * bounds the driver materialization to the cap even when the input
    * is accidentally fact-sized. */
  def sink(df: DataFrame, path: String, sheet: String,
      maxRows: Int = MaxDataRows): Unit = {
    require(maxRows > 0 && maxRows <= MaxDataRows,
      s"maxRows must be in [1, $MaxDataRows], got $maxRows")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"XlsxSink.sink: input exceeds $maxRows rows — xlsx is a " +
        "dimension-sized format; use a parquet/CSV sink for fact data")
    val header: Seq[Any] = df.columns.toSeq
    write(path, Seq(sheet -> (header +: rows.map(_.toSeq).toSeq)))
  }
}
