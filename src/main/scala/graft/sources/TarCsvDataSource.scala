package graft.sources

import java.io.BufferedInputStream
import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector reading ONE `;`-CSV member straight out of
  * a `.tar.gz` — the reference's ingest edge
  * (`dags/icpe-siretisation.py:19-54` downloads the Géorisques tarball
  * and extracts members to disk before pandas reads them) without the
  * staging step:
  *
  * {{{
  * spark.read.format("graft.sources.TarCsvDataSource")
  *   .schema(Schemas.etablissements)
  *   .option("path", "/data/icpe.tar.gz")
  *   .option("entry", "IC_etablissement.csv")
  *   .load()
  * }}}
  *
  * Schema is explicit (engine philosophy: never infer, leading zeros
  * are load-bearing); empty fields read as NULL (pandas NaN parity);
  * text dates parse DAY-FIRST like the reference. Column pruning is
  * pushed into the reader: unprojected fields are never converted.
  *
  * One input partition per scan — a gzip stream is not splittable, so
  * this source is the INGEST EDGE, not the working layout: read it
  * once, write parquet (see `ops/Maintenance.writeClustered`), query
  * that. CSV dialect limits (documented, matching the ICPE exports):
  * no quoting or embedded separators/newlines in fields.
  */
class TarCsvDataSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-tar-csv requires an explicit .schema(...) — inference would " +
        "guess away leading-zero identifiers (SURVEY §1.2)")

  override def getTable(userSchema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TarCsvTable(userSchema, properties.asScala.toMap)
}

private[sources] class TarCsvTable(tableSchema: StructType, props: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = s"tar-csv:${props.getOrElse("path", "?")}!${props.getOrElse("entry", "?")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarCsvScanBuilder(schema, props ++ options.asScala)
}

private[sources] class TarCsvScanBuilder(fullSchema: StructType, props: Map[String, String])
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TarCsvScan(fullSchema, required, props)
}

private[sources] class TarCsvScan(fullSchema: StructType, required: StructType,
                                  props: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(TarCsvPartition(props("path"), props("entry"),
      props.getOrElse("sep", ";"), props.getOrElse("header", "false").toBoolean))
  override def createReaderFactory(): PartitionReaderFactory =
    new TarCsvReaderFactory(fullSchema, required)
}

private[sources] case class TarCsvPartition(path: String, entry: String,
                                            sep: String, header: Boolean)
  extends InputPartition

private[sources] class TarCsvReaderFactory(fullSchema: StructType, required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TarCsvReader(partition.asInstanceOf[TarCsvPartition], fullSchema, required)
}

private[sources] class TarCsvReader(p: TarCsvPartition, fullSchema: StructType,
                                    required: StructType)
  extends PartitionReader[InternalRow] {

  private val DayFirstDate = DateTimeFormatter.ofPattern("d/M/yyyy")
  private val DayFirstTs = DateTimeFormatter.ofPattern("d/M/yyyy[ H:mm:ss]")

  // column index in the FILE (= full schema position) per required field
  private val fieldIdx: Array[Int] = required.fields.map(f => fullSchema.fieldIndex(f.name))

  // Hadoop FileSystem, not java.io: the tarball may live on HDFS/object
  // storage on a real cluster, not on every executor's local disk
  private val tar = {
    val hp = new org.apache.hadoop.fs.Path(p.path)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    new TarArchiveInputStream(new GZIPInputStream(
      new BufferedInputStream(fs.open(hp))))
  }
  private val lines: Iterator[String] =
    try {
      Iterator.continually(tar.getNextEntry)
        .takeWhile(_ != null)
        .find(e => e.getName == p.entry && !e.isDirectory)
        .getOrElse(throw new IllegalArgumentException(
          s"entry ${p.entry} not found in ${p.path}"))
      val src = scala.io.Source.fromInputStream(tar, "UTF-8")
      val it = src.getLines()
      if (p.header && it.hasNext) it.next()
      it
    } catch {
      // a failed initializer means Spark never gets a reader to
      // close() — release the file descriptor before rethrowing
      case e: Throwable => tar.close(); throw e
    }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!lines.hasNext) false
    else { current = convert(lines.next()); true }

  private def convert(line: String): InternalRow = {
    val cells = line.split(java.util.regex.Pattern.quote(p.sep), -1)
    val out = new Array[Any](required.length)
    var i = 0
    while (i < fieldIdx.length) {
      val raw = if (fieldIdx(i) < cells.length) cells(fieldIdx(i)) else ""
      out(i) = if (raw.isEmpty) null else cast(raw, required.fields(i).dataType)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  private def cast(raw: String, dt: DataType): Any = dt match {
    case StringType => UTF8String.fromString(raw)
    case IntegerType => raw.trim.toInt
    case LongType => raw.trim.toLong
    case DoubleType => raw.trim.toDouble
    case DateType =>
      DateTimeUtils.localDateToDays(LocalDate.parse(raw.trim, DayFirstDate))
    case TimestampType =>
      val t = DayFirstTs.parseBest(raw.trim,
        java.time.LocalDateTime.from _, LocalDate.from _)
      val ldt = t match {
        case d: LocalDate => d.atStartOfDay()
        case dt: java.time.LocalDateTime => dt
      }
      DateTimeUtils.localDateTimeToMicros(ldt)
    case other =>
      throw new UnsupportedOperationException(s"tar-csv: unsupported type $other")
  }

  override def get(): InternalRow = current
  override def close(): Unit = tar.close()
}
