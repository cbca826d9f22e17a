package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Plan-time file listing shared by the V2 sources for non-splittable
  * formats ([[PdfDataSource]], [[XlsxDataSource]]): comma-separated
  * specs, Hadoop globs, directories expanded one level, suffix-filtered,
  * deterministic order. Listing stays in the planner (driver) — each
  * listed file then becomes exactly one input partition. */
private[sources] object V2Files {

  def list(pathSpec: String, conf: Configuration, suffix: String): Seq[String] =
    pathSpec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap { p =>
      val path = new HPath(p)
      val fs: FileSystem = path.getFileSystem(conf)
      val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Nil)
      matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
    }.map(_.getPath.toString).filter(_.endsWith(suffix)).distinct.sorted

  /** Whole-file bytes through the Hadoop FS API (works for any scheme the
    * cluster can reach, not just local paths). */
  def readBytes(file: String, conf: Configuration): Array[Byte] = {
    val path = new HPath(file)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val len0 = fs.getFileStatus(path).getLen
      require(len0 <= Int.MaxValue,
        s"$file is $len0 bytes — too large for a whole-file read " +
          "(non-splittable formats are read as one in-memory buffer)")
      val buf = new Array[Byte](len0.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }
}
