package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 wrapper around [[Excel]]:
  * `spark.read.format("graft-xlsx").option("sheet", "Sites").load(dir)`
  * plans ONE input partition per workbook file (xlsx is not splittable)
  * and parses the selected sheet executor-side from bytes fetched through
  * the Hadoop filesystem — no driver bottleneck when a directory holds
  * many workbooks (the reference's quarterly-email accumulation pattern,
  * `/root/reference/direct/direct_water_prep.py:69`).
  *
  * Semantics match [[Excel.readSheet]]: all-string columns named by the
  * sheet's header row; type with [[Excel.cast]] downstream. The schema is
  * inferred from the FIRST file (deterministic listing order); other
  * files' columns are matched by header name, missing ones read as null,
  * extras ignored — the same union-by-header rule as multi-file CSV (S2).
  * `sheet` defaults to each workbook's first sheet.
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-xlsx"

  /** Header of the FIRST listed file only. The one plan-time parse does
    * build that file's full sheet DOM (the JDK DOM parser has no early
    * exit) — bounded by a single workbook, not the directory; acceptable
    * for the dimension-sized workbooks this format carries. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val pathSpec = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-xlsx requires a path"))
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val files = V2Files.list(pathSpec, conf, ".xlsx")
    require(files.nonEmpty, s"graft-xlsx: no .xlsx files match $pathSpec")
    val header = XlsxDataSource.headerOf(
      V2Files.readBytes(files.head, conf), Option(options.get("sheet")), files.head)
    // fail HERE with the file name, not later with an opaque analyzer
    // error: empty headers make unreferenceable columns, duplicates make
    // the by-name reader binding silently pick the first occurrence
    require(!header.exists(_.isEmpty),
      s"graft-xlsx: empty header cell(s) at position(s) " +
        s"${header.zipWithIndex.collect { case ("", i) => i }.mkString(", ")} " +
        s"in ${files.head}")
    val dups = header.groupBy(identity).collect { case (h, hs) if hs.size > 1 => h }
    require(dups.isEmpty,
      s"graft-xlsx: duplicate header(s) ${dups.mkString("'", "', '", "'")} in ${files.head}")
    StructType(header.map(StructField(_, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(schema.fields.forall(_.dataType == StringType),
      "graft-xlsx reads all-string columns; apply Excel.cast after load " +
        "instead of passing a typed schema")
    new XlsxTable(schema, properties.asScala.toMap)
  }
}

private[sources] object XlsxDataSource {

  /** Resolve the sheet (named, or the workbook's first) and return its
    * trimmed header row. */
  def headerOf(bytes: Array[Byte], sheet: Option[String], file: String): Seq[String] =
    gridOf(bytes, sheet, file).headOption
      .map(_.map(h => Option(h).getOrElse("").trim).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        s"empty sheet${sheet.fold("")(s => s" '$s'")} in $file"))

  def gridOf(bytes: Array[Byte], sheet: Option[String], file: String): Seq[Array[String]] = {
    val ar = Excel.archive(bytes)
    val targets = Excel.sheetTargets(ar)
    val target = sheet match {
      case Some(s) => targets.collectFirst { case (n, t) if n == s => t }
        .getOrElse(throw new IllegalArgumentException(
          s"no sheet '$s' in $file (has: ${targets.map(_._1).mkString(", ")})"))
      case None => targets.headOption.map(_._2)
        .getOrElse(throw new IllegalArgumentException(s"no sheets in $file"))
    }
    Excel.readGrid(ar, target)
  }
}

private[sources] class XlsxTable(tableSchema: StructType, properties: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = s"graft-xlsx(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new XlsxScan(
        Option(options.get("path")).orElse(properties.get("path"))
          .getOrElse(throw new IllegalArgumentException("graft-xlsx requires a path")),
        Option(options.get("sheet")).orElse(properties.get("sheet")),
        tableSchema)
    }
}

private[sources] class XlsxScan(pathSpec: String, sheet: Option[String],
    schema: StructType) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-xlsx scan of $pathSpec${sheet.fold("")(s => s" sheet=$s")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    V2Files.list(pathSpec, conf, ".xlsx")
      .map(f => XlsxFilePartition(f, sheet): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxPartitionReaderFactory(schema,
      new SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

private[sources] case class XlsxFilePartition(file: String, sheet: Option[String])
    extends InputPartition

private[sources] class XlsxPartitionReaderFactory(schema: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[XlsxFilePartition]
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = {
        val grid = XlsxDataSource.gridOf(
          V2Files.readBytes(p.file, conf.value), p.sheet, p.file)
        if (grid.isEmpty) Iterator.empty
        else {
          val header = grid.head.map(h => Option(h).getOrElse("").trim)
          // plan-schema field → this file's column position (first wins on
          // duplicate headers), -1 = absent in this file → null column
          val idx = schema.fields.map(f => header.indexOf(f.name))
          grid.tail.iterator.map { arr =>
            InternalRow.fromSeq(idx.toSeq.map { i =>
              if (i >= 0 && i < arr.length && arr(i) != null)
                UTF8String.fromString(arr(i))
              else null
            })
          }
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
