package graft.sources

/** Test alias for the engine's xlsx sink ([[XlsxSink]], promoted to
  * main scope in r10 for the oracle-checked round-trip query q81) —
  * kept so fixture-building specs read as "generate a workbook". */
object XlsxGen {
  def write(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit =
    XlsxSink.write(path, sheets)
}
