package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 wrapper around [[Pdf]] (SURVEY.md §7.3 phase 2):
  * `spark.read.format("graft-pdf").load(dir)` plans ONE input partition
  * per PDF file — the natural parallel grain for a non-splittable
  * format — and each executor task runs the whole extractor on its file.
  * Identical rows to [[Pdf.scan]]; this form adds the standard source
  * UX (format string, catalog-visible schema) and keeps file listing in
  * the planner rather than a separate binaryFile scan.
  */
class PdfDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-pdf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Schemas.data

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PdfTable(properties.asScala.toMap)
}

private[sources] class PdfTable(properties: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = s"graft-pdf(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = Schemas.data
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new PdfScan(
        Option(options.get("path"))
          .orElse(properties.get("path"))
          .getOrElse(throw new IllegalArgumentException("graft-pdf requires a path")))
    }
}

private[sources] class PdfScan(pathSpec: String) extends Scan with Batch {

  override def readSchema(): StructType = Schemas.data
  override def toBatch: Batch = this
  override def description(): String = s"graft-pdf scan of $pathSpec"

  /** One partition per *.pdf file: listed at plan time on the driver,
    * globs supported, directories expanded one level. */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    V2Files.list(pathSpec, conf, ".pdf").map(f => PdfFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PdfPartitionReaderFactory(
      new SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

private[sources] case class PdfFilePartition(file: String) extends InputPartition

private[sources] class PdfPartitionReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PdfFilePartition].file
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = {
        val bytes = V2Files.readBytes(file, conf.value)
        val toInternal = ExpressionEncoder(RowEncoder.encoderFor(Schemas.data))
          .createSerializer()
        Pdf.extract(bytes).iterator.map(r => toInternal(r).copy())
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
