package graft.sources

import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element

/** Excel source (S3/S4): a dependency-free `.xlsx` reader — the format is
  * a zip of XML parts, so the JDK's ZipFile + DOM parser cover it without
  * an external DataSource (the build is offline; SURVEY.md §7.3 chose the
  * converter route over `spark-excel`).
  *
  * Replaces `pd.read_excel` single-sheet
  * (`/root/reference/down/down_water_prep.py:257`) and the 3-tab
  * selective read (`/root/reference/direct/direct_water_prep.py:69-74`).
  *
  * Scale posture: this entry point driver-parses then parallelizes — the
  * right call because every workbook the reference consumes is a
  * dimension (5,564 sites, hundreds of system-info rows), and xlsx is
  * not a splittable format to begin with. Fact-scale data enters via
  * CSV/Parquet scans; a pipeline ingests a workbook ONCE and checkpoints
  * it columnar (see [[Csv.sink]] / parquet) so executors never touch xlsx.
  * For directories of MANY workbooks, [[XlsxDataSource]]
  * (`format("graft-xlsx")`) parses each file executor-side instead —
  * one partition per workbook, no driver bottleneck.
  */
object Excel {

  /** All sheet names, workbook order. */
  def sheetNames(path: String): Seq[String] =
    withZip(path) { zip => sheetTargets(zip).map(_._1) }

  /** S3 — one sheet as an all-string DataFrame, columns named by the
    * header row (pad-missing-trailing-cells semantics, like pandas). */
  def readSheet(spark: SparkSession, path: String, sheet: String): DataFrame = {
    val grid = withZip(path) { zip =>
      val target = sheetTargets(zip).collectFirst { case (n, t) if n == sheet => t }
        .getOrElse(throw new IllegalArgumentException(
          s"no sheet '$sheet' in $path (has: ${sheetTargets(zip).map(_._1).mkString(", ")})"))
      readGrid(zip, target)
    }
    require(grid.nonEmpty, s"sheet '$sheet' in $path is empty")
    val header = grid.head.map(h => Option(h).getOrElse("").trim)
    val width = header.length
    val rows = grid.tail.map { r =>
      Row.fromSeq(r.padTo(width, null).take(width).toSeq)
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** S4 — selective multi-sheet read: each requested sheet becomes its own
    * DataFrame (the reference's `sheet_name=[...]` dict shape). */
  def readSheets(spark: SparkSession, path: String, sheets: Seq[String]): Map[String, DataFrame] =
    sheets.map(s => s -> readSheet(spark, path, s)).toMap

  /** Apply a typed schema to an all-string sheet frame by column name
    * (same cast-at-the-edge discipline as [[Csv.scan]]; empty strings
    * become NULL before the cast, matching CSV's empty-field reads). */
  def cast(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map { f =>
      import org.apache.spark.sql.functions.{nullif, lit}
      nullif(col(f.name), lit("")).cast(f.dataType).as(f.name)
    }.toSeq: _*)

  // ------------------------------------------------------------- internals

  /** Zip-part access abstraction: the driver path reads a local file via
    * random-access [[ZipFile]]; the V2 source ([[XlsxDataSource]]) hands
    * executors raw bytes fetched through the Hadoop filesystem, scanned
    * per part with a [[java.util.zip.ZipInputStream]] (workbooks are
    * dimension-sized — a rescan per part is cheaper than staging a temp
    * file on every executor). */
  private[sources] sealed trait Archive {
    def open(name: String): Option[java.io.InputStream]
  }

  private final class ZipArchive(zip: ZipFile) extends Archive {
    def open(name: String): Option[java.io.InputStream] =
      Option(zip.getEntry(name)).map(zip.getInputStream)
  }

  private final class BytesArchive(bytes: Array[Byte]) extends Archive {
    def open(name: String): Option[java.io.InputStream] = {
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
      // on a miss, close here — the stream's Inflater holds a native
      // buffer that would otherwise wait for GC finalization; on a hit
      // the caller closes (parseEntry's try/finally)
      val hit = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .exists(_.getName == name)
      if (hit) Some(zin) else { zin.close(); None }
    }
  }

  private[sources] def archive(bytes: Array[Byte]): Archive = new BytesArchive(bytes)

  private def withZip[A](path: String)(f: Archive => A): A = {
    val zip = new ZipFile(path)
    try f(new ZipArchive(zip)) finally zip.close()
  }

  private def parseEntry(ar: Archive, name: String): Option[Element] =
    ar.open(name).map { in =>
      val dbf = DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(false)
      // workbooks arrive from outside (the reference's is emailed):
      // forbid DTDs/external entities so a crafted file can't XXE-read
      // driver-local files or blow memory via entity expansion
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      dbf.setFeature("http://xml.org/sax/features/external-general-entities", false)
      dbf.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
      dbf.setXIncludeAware(false)
      dbf.setExpandEntityReferences(false)
      try dbf.newDocumentBuilder().parse(in).getDocumentElement
      finally in.close()
    }

  private def children(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** (sheetName, zip entry of the sheet XML), workbook order. */
  private[sources] def sheetTargets(ar: Archive): Seq[(String, String)] = {
    val wb = parseEntry(ar, "xl/workbook.xml")
      .getOrElse(throw new IllegalArgumentException("not an xlsx: no xl/workbook.xml"))
    val rels = parseEntry(ar, "xl/_rels/workbook.xml.rels")
      .map(children(_, "Relationship")
        .map(r => r.getAttribute("Id") -> r.getAttribute("Target")).toMap)
      .getOrElse(Map.empty)
    children(wb, "sheet").map { s =>
      val rid = Option(s.getAttribute("r:id")).filter(_.nonEmpty)
        .getOrElse(s.getAttribute("id"))
      val target = rels.getOrElse(rid, s"worksheets/sheet${s.getAttribute("sheetId")}.xml")
      val entry = if (target.startsWith("/")) target.drop(1)
                  else if (target.startsWith("xl/")) target
                  else s"xl/$target"
      s.getAttribute("name") -> entry
    }
  }

  private def sharedStrings(ar: Archive): IndexedSeq[String] =
    parseEntry(ar, "xl/sharedStrings.xml")
      .map(root => children(root, "si").map(si =>
        children(si, "t").map(_.getTextContent).mkString).toIndexedSeq)
      .getOrElse(IndexedSeq.empty)

  /** "BC7" → 0-based column index 54. */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  /** Sheet XML → dense row-major grid of cell strings (null = no cell). */
  private[sources] def readGrid(ar: Archive, entry: String): Seq[Array[String]] = {
    val root = parseEntry(ar, entry)
      .getOrElse(throw new IllegalArgumentException(s"missing $entry"))
    val shared = sharedStrings(ar)
    children(root, "row").map { rowEl =>
      val cells = children(rowEl, "c")
      val buf = ArrayBuffer.empty[String]
      cells.zipWithIndex.foreach { case (c, fallbackIdx) =>
        val idx = Option(c.getAttribute("r")).filter(_.nonEmpty)
          .map(colIndex).getOrElse(fallbackIdx)
        val t = c.getAttribute("t")
        val v = t match {
          case "inlineStr" => children(c, "t").map(_.getTextContent).mkString
          case "s" =>
            children(c, "v").headOption.map(_.getTextContent.trim.toInt)
              .map(shared.apply).orNull
          case _ => children(c, "v").headOption.map(_.getTextContent).orNull
        }
        while (buf.length < idx) buf += null
        if (buf.length == idx) buf += v else buf(idx) = v
      }
      buf.toArray
    }
  }
}
