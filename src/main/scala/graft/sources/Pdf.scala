package graft.sources

import java.util.zip.Inflater

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** PDF table source (S5/S6/J8) — the reference's one genuinely custom
  * component (`/root/reference/down/down_water_prep.py:568-984`),
  * re-built on the JVM with no external libraries: a minimal PDF text
  * extractor (object scan → content streams, FlateDecode via the JDK's
  * Inflater, BT/ET text runs with Tm/Td positioning) feeding the same
  * page-condition state machine the reference drives through
  * PyPDF2 + a tabula subprocess per page.
  *
  * Handled page conditions (same taxonomy as the reference):
  *  - banner line `*** PWSID = … | SYSTEM NAME = …*** <n>` per page
  *    (`down_water_prep.py:594-615`) → PWSID / SYSTEM NAME / SYSNAME_PAGE
  *    provenance;
  *  - area extraction with top-margin 70 retried at 45 when the header
  *    is not where expected (`down_water_prep.py:169-172,619-621`);
  *  - full-page table (both check columns present,
  *    `down_water_prep.py:719-731`);
  *  - column-split tables: part 1 (Contaminant ID side) held, part 2
  *    (Analysis Method side) stitched column-wise by row order — J8
  *    (`down_water_prep.py:735-768`);
  *  - headerless carryover of a part-1 fragment (6/7 cells,
  *    `down_water_prep.py:790-860`) appended under the held header;
  *  - 16-column gate (G4, `down_water_prep.py:633-637`) — violations
  *    throw with page context (G5 fail-fast, no interactive prompt).
  * The reference's 4/5-cell wrap-patch edge case
  * (`down_water_prep.py:861-945`) is resolved by the TOP2 retry here
  * (the narrower margin reads the wrapped run as one row); a page
  * failing every condition at both margins throws.
  *
  * Scale posture: [[scan]] distributes WHOLE FILES to executors via the
  * binaryFile source and runs this extractor per file inside a
  * `flatMap` — one task per PDF, no driver parsing, no subprocess per
  * page (the reference launches a tabula JVM per page — thousands per
  * run, `down_water_prep.py:659`). PDF is not splittable; per-file is
  * the right parallel grain, and a 10-year drop of yearly files scans
  * as 10 parallel tasks feeding one DataFrame.
  */
object Pdf {

  /** One positioned text run. `yTop` is measured from the TOP of the
    * page (tabula's area convention), i.e. 792 − PDF y. */
  final case class Item(x: Double, yTop: Double, text: String)
  final case class Page(index: Int, items: Seq[Item]) {
    /** The topmost text line — where the reference reads the banner
      * (`down_water_prep.py:602`). */
    def firstLine: String =
      if (items.isEmpty) ""
      else {
        val topY = items.map(_.yTop).min
        items.filter(i => math.abs(i.yTop - topY) < 2).sortBy(_.x).map(_.text).mkString(" ")
      }
  }

  val Top1 = 70
  val Top2 = 45
  private val PageHeight = 792.0

  val TableHeaders: Seq[String] = Seq(
    "Sample Location", "Contaminant ID", "Analysis Result", "MCL In Effect",
    "Sample Date", "Sample Type", "Laboratory ID", "Analysis Method",
    "Analysis Date", "Sample Received Date")
  private val Part1Headers = TableHeaders.take(6) // ..Sample Type
  private val Part2Headers = TableHeaders.drop(6) // Laboratory ID..
  private val Check1 = "Contaminant ID"
  private val Check2 = "Analysis Method"

  private val BannerRe: Regex =
    """\*{3}\s*PWSID = (\d+) \| SYSTEM NAME = (.*?)\*{3}\s*(\d+)""".r

  // ------------------------------------------------------------ extraction

  /** Whitespace canonicalization of a cell (X3,
    * `down_water_prep.py:666-670`). */
  private def canon(s: String): String =
    s.replaceAll("[\\r\\n\\t]", " ").replaceAll(" +", " ").trim

  /** Table grid inside the area below `top` points from the page top:
    * rows clustered by y (2pt tolerance), cells ordered by x. */
  def grid(page: Page, top: Int): Seq[Seq[String]] = {
    val inArea = page.items.filter(_.yTop >= top)
    val rows = ArrayBuffer.empty[(Double, ArrayBuffer[Item])]
    inArea.sortBy(i => (i.yTop, i.x)).foreach { it =>
      rows.find { case (y, _) => math.abs(y - it.yTop) < 2 } match {
        case Some((_, buf)) => buf += it
        case None => rows += ((it.yTop, ArrayBuffer(it)))
      }
    }
    rows.sortBy(_._1).map(_._2.sortBy(_.x).map(i => canon(i.text)).toSeq).toSeq
  }

  private final case class Provenance(
      pwsid: Long, sysName: String, mainPage: Int, top: Int, sysNamePage: Int)

  /** The 16 output columns in [[Schemas.data]] order. */
  private def toRow(cells: Seq[String], splitPages: Int, p: Provenance): Row =
    Row.fromSeq(cells.padTo(10, null).take(10) ++
      Seq(splitPages, p.pwsid, p.sysName, p.mainPage, p.top, p.sysNamePage))

  /** Parse one PDF's bytes into data rows (driver- or executor-side). */
  def extract(bytes: Array[Byte]): Seq[Row] = {
    val out = ArrayBuffer.empty[Row]
    // held part-1 fragment: (header, rows, provenance) awaiting its part 2
    var held: Option[(Seq[String], ArrayBuffer[Seq[String]], Provenance)] = None

    pages(bytes).foreach { page =>
      val banner = page.firstLine
      val prov = BannerRe.findFirstMatchIn(banner) match {
        case Some(m) =>
          Provenance(m.group(1).toLong, m.group(2).trim, page.index + 1, Top1, m.group(3).toInt)
        case None =>
          throw new IllegalStateException(
            s"G5: page ${page.index + 1} has no PWSID banner: '$banner'")
      }

      def attempt(top: Int): Boolean = {
        val g = grid(page, top).filter(_.nonEmpty)
        if (g.isEmpty) return true // blank table area: nothing to add
        val header = g.head
        val dataRows = g.tail
        val p = prov.copy(top = top)
        if (header.contains(Check1) && header.contains(Check2)) {
          // condition 1: whole table on the page. A held part-1 fragment
          // at this point means its part 2 never arrived — losing its
          // rows silently would corrupt the extract, so fail loudly.
          if (held.isDefined) throw new IllegalStateException(
            s"G5: page ${page.index + 1} is a full table but a part-1 split fragment is still held")
          dataRows.foreach(r => out += toRow(align(header, r, TableHeaders), 1, p))
          true
        } else if (header.contains(Check1)) {
          // condition 2: part 1 of a column split — hold for the stitch
          if (held.isDefined) throw new IllegalStateException(
            s"G5: page ${page.index + 1} starts a new part-1 split while one is still held")
          held = Some((header, ArrayBuffer(dataRows.map(align(header, _, Part1Headers)): _*), p))
          true
        } else if (header.contains(Check2)) {
          // condition 3: part 2 — J8 column-axis stitch by row order
          val (h1, rows1, p1) = held.getOrElse(throw new IllegalStateException(
            s"G5: page ${page.index + 1} is a part-2 split with no held part 1"))
          val rows2 = dataRows.map(align(header, _, Part2Headers))
          if (rows1.length != rows2.length) throw new IllegalStateException(
            s"G5: split-page stitch mismatch at page ${page.index + 1}: " +
              s"${rows1.length} part-1 rows vs ${rows2.length} part-2 rows")
          rows1.zip(rows2).foreach { case (a, b) => out += toRow(a ++ b, 2, p1) }
          held = None
          true
        } else if (held.isDefined && (header.length == 6 || header.length == 7)) {
          // condition 4: headerless carryover of a part-1 fragment — the
          // "header" row is really data; append everything under the held
          // part-1 header (down_water_prep.py:790-860)
          val (h1, rows1, _) = held.get
          (header +: dataRows).foreach(r => rows1 += align(h1, r, Part1Headers))
          true
        } else false
      }

      if (!attempt(Top1) && !attempt(Top2))
        throw new IllegalStateException(
          s"G5: page ${page.index + 1} matched no table condition at either margin " +
            s"(first cells: ${grid(page, Top2).headOption.getOrElse(Nil).take(4).mkString(" | ")})")
    }
    if (held.isDefined) throw new IllegalStateException(
      "G5: file ended holding an unstitched part-1 split fragment")

    // G4: every row carries exactly the 16 expected columns by construction;
    // verify the construction (sorted header set, down_water_prep.py:633-637)
    require(out.forall(_.length == 16), "G4: row width != 16")
    out.toSeq
  }

  /** Reorder a row's cells from the page header order into `want` order;
    * header names not in `want` are dropped, missing ones become null. */
  private def align(header: Seq[String], row: Seq[String], want: Seq[String]): Seq[String] = {
    val byName = header.zip(row.padTo(header.length, null)).toMap
    want.map(byName.get(_).orNull)
  }

  /** S5/S6 distributed scan: every `*.pdf` under the paths becomes one
    * executor task; result columns match [[Schemas.data]]. Thin facade
    * over the single engine path, the V2 [[PdfDataSource]] — one
    * partition per file planned by the source, no side binaryFile scan
    * or RDD hop (an earlier `binaryFile`+`rdd.flatMap` twin of the V2
    * source was deleted: two scan paths, one bug surface each). */
  def scan(spark: SparkSession, paths: String*): DataFrame =
    spark.read.format("graft-pdf").option("path", paths.mkString(",")).load()

  // ----------------------------------------------------- minimal PDF reader

  /** All pages with positioned text items, in page-tree order. */
  def pages(bytes: Array[Byte]): Seq[Page] = {
    val raw = new String(bytes, "ISO-8859-1")
    val objRe = """(?s)(\d+)\s+0\s+obj(.*?)endobj""".r
    val objs: Map[Int, String] =
      objRe.findAllMatchIn(raw).map(m => m.group(1).toInt -> m.group(2)).toMap

    def streamOf(body: String): Option[Array[Byte]] = {
      val i = body.indexOf("stream")
      if (i < 0) return None
      val start = {
        val afterKeyword = i + "stream".length
        if (body.startsWith("\r\n", afterKeyword)) afterKeyword + 2
        else if (body.startsWith("\n", afterKeyword)) afterKeyword + 1
        else afterKeyword
      }
      val end = body.indexOf("endstream", start)
      if (end < 0) return None
      val data = body.substring(start, end).getBytes("ISO-8859-1")
      if (body.substring(0, i).contains("/FlateDecode")) Some(inflate(data))
      else Some(data)
    }

    val kidsRe = """/Kids\s*\[([^\]]*)\]""".r
    val refRe = """(\d+)\s+0\s+R""".r
    def kidsOf(body: String): Seq[Int] =
      kidsRe.findFirstMatchIn(body).toSeq
        .flatMap(m => refRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt))
    // resolve the page tree from the CATALOG's /Pages reference and walk
    // it recursively — matching any '/Type /Pages' object out of the
    // unordered map could land on an interior node of a nested tree and
    // silently drop every page outside that subtree
    def walk(objNum: Int): Seq[Int] = objs.get(objNum) match {
      case Some(body) if body.contains("/Pages") => kidsOf(body).flatMap(walk)
      case Some(_) => Seq(objNum)
      case None => Nil
    }
    val rootPages: Option[Int] = objs.values.collectFirst {
      case body if body.contains("/Catalog") =>
        """/Pages\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(body).map(_.group(1).toInt)
    }.flatten
    val pageOrder: Seq[Int] = rootPages.map(walk).filter(_.nonEmpty).getOrElse(
      // no catalog/page tree: fall back to object order of /Type /Page objects
      objs.toSeq.sortBy(_._1).collect {
        case (n, body) if body.contains("/Type") && body.contains("/Page") &&
          !body.contains("/Pages") => n
      })

    pageOrder.zipWithIndex.map { case (pageObj, idx) =>
      val body = objs(pageObj)
      val contentRefs = """/Contents\s+(\d+)\s+0\s+R""".r
        .findFirstMatchIn(body).map(_.group(1).toInt)
      val content = contentRefs.flatMap(objs.get).flatMap(streamOf)
        .map(b => new String(b, "ISO-8859-1")).getOrElse("")
      Page(idx, textItems(content))
    }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var stuck = false
      while (!inf.finished() && !inf.needsInput() && !stuck) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else stuck = true // truncated / dictionary-needing stream: stop with what we have
      }
      out.toByteArray
    } finally inf.end() // native zlib state — never leak it on the early path
  }

  /** Interpret the text operators of one content stream: `BT` (resets the
    * text position), `a b c d e f Tm` (absolute) and `x y Td/TD`
    * (relative) positioning, `(…) Tj` shows. One leftmost-match token
    * scan: string literals are consumed whole by the Tj branch, so
    * operator names occurring INSIDE shown text (e.g. the "ET" in
    * "METH3") can never be misread as operators. Enough for text-based
    * table PDFs; graphics, fonts and kerned TJ arrays are ignored. */
  private def textItems(content: String): Seq[Item] = {
    val items = ArrayBuffer.empty[Item]
    val tokenRe = """(?s)\(((?:\\.|[^()\\])*)\)\s*Tj|(-?[\d.]+)\s+(-?[\d.]+)\s+Td|(-?[\d.]+)\s+(-?[\d.]+)\s+TD|(?:-?[\d.]+\s+){4}(-?[\d.]+)\s+(-?[\d.]+)\s+Tm|\b(BT)\b""".r
    var x = 0.0
    var y = 0.0
    tokenRe.findAllMatchIn(content).foreach { m =>
      if (m.group(1) != null) {
        val s = m.group(1)
          .replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")
        items += Item(x, PageHeight - y, s)
      } else if (m.group(2) != null) { x += m.group(2).toDouble; y += m.group(3).toDouble }
      else if (m.group(4) != null) { x += m.group(4).toDouble; y += m.group(5).toDouble }
      else if (m.group(6) != null) { x = m.group(6).toDouble; y = m.group(7).toDouble }
      else { x = 0.0; y = 0.0 } // BT
    }
    items.toSeq
  }
}
