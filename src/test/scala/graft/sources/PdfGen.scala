package graft.sources

import java.io.FileOutputStream
import java.util.zip.Deflater

/** Test-fixture PDF writer: emits a minimal page-tree PDF whose content
  * streams position each cell with `Tm` + `Tj` — real PDF structure
  * (including FlateDecode-compressed streams) without external libs.
  * Test scope only. */
object PdfGen {

  /** One page = positioned text items (x, yTop-from-page-top, text). */
  def write(path: String, pages: Seq[Seq[(Double, Double, String)]],
      compress: Boolean = false): Unit = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val pageObjNums = pages.indices.map(i => 3 + i * 2)
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = sb.write(s.getBytes("ISO-8859-1"))
    def wb(b: Array[Byte]): Unit = sb.write(b)

    w("%PDF-1.4\n")
    w("1 0 obj<< /Type /Catalog /Pages 2 0 R >>endobj\n")
    w(s"2 0 obj<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] /Count ${pages.length} >>endobj\n")
    pages.zipWithIndex.foreach { case (items, i) =>
      val pageObj = pageObjNums(i)
      val contentObj = pageObj + 1
      w(s"$pageObj 0 obj<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $contentObj 0 R >>endobj\n")
      val text = items.map { case (x, yTop, s) =>
        s"1 0 0 1 $x ${792 - yTop} Tm (${esc(s)}) Tj"
      }.mkString("BT\n", "\n", "\nET")
      val raw = text.getBytes("ISO-8859-1")
      val (payload, filter) =
        if (compress) {
          val d = new Deflater()
          d.setInput(raw); d.finish()
          val buf = new Array[Byte](raw.length * 2 + 64)
          val n = d.deflate(buf)
          d.end()
          (buf.take(n), " /Filter /FlateDecode")
        } else (raw, "")
      w(s"$contentObj 0 obj<< /Length ${payload.length}$filter >>stream\n")
      wb(payload)
      w("\nendstream endobj\n")
    }
    w("trailer<< /Root 1 0 R >>\n%%EOF\n")
    val out = new FileOutputStream(path)
    try out.write(sb.toByteArray) finally out.close()
  }
}
