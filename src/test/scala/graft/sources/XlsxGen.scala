package graft.sources

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Test-fixture xlsx writer: emits a minimal standards-shaped workbook
  * (workbook.xml + rels + sharedStrings + one XML part per sheet) so
  * [[Excel]] is tested against real zip/XML structure, including shared
  * strings, numeric cells, explicit cell references and rows with
  * missing trailing cells. Test scope only — the engine itself never
  * writes xlsx.
  */
object XlsxGen {

  private def xml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** `cells` value conventions: String → shared-string cell, Number →
    * numeric cell, null → cell omitted entirely (not an empty string). */
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
              case n => s"""<c r="$ref"><v>$n</v></c>"""
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

    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", rels)
      put("xl/sharedStrings.xml", sst)
      sheetXmls.zipWithIndex.foreach { case (x, i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", x)
      }
    } finally zos.close()
  }
}
