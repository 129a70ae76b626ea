package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's date-prefixed CSV layout
  * (`"<YYYY-MM-DD>/<date>_BINS_XETR<HH>.csv"` under one base path —
  * `xetra/common/s3.py:52-63` + the extract loop,
  * `xetra_transformer.py:104-125`). The reference's ONE manual optimization
  * — listing only pending dates' prefixes — becomes *declarative* here:
  * `Date` predicates push into the scan and prune whole date directories at
  * planning time, and column pruning narrows what each reader parses. A
  * plain `df.filter(col("Date") >= d)` now reads exactly the files the
  * reference's hand-rolled date loop would, with no driver-side path
  * plumbing in user code.
  *
  * Usage: `spark.read.format("graft.sources.XetraBarsProvider")
  * .load(basePath)`. Pruning is conservative: every pushed filter is also
  * returned as a residual, so Spark re-evaluates rows and correctness never
  * depends on the pruning logic.
  */
class XetraBarsProvider extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "xetra-bars" // via META-INF/services
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XetraBarsTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new XetraBarsTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object XetraBarsTable {
  /** The reference's 9 source columns with declared types (FIXTURES.md §1;
    * pandas inference replaced by a schema, SURVEY.md §4.4.3).
    */
  val Schema: StructType = StructType(Seq(
    StructField("ISIN", StringType), StructField("Mnemonic", StringType),
    StructField("Date", StringType), StructField("Time", StringType),
    StructField("StartPrice", DoubleType), StructField("EndPrice", DoubleType),
    StructField("MinPrice", DoubleType), StructField("MaxPrice", DoubleType),
    StructField("TradedVolume", LongType)))
}

class XetraBarsTable(path: String) extends Table with SupportsRead {
  require(path != null, "xetra-bars source requires a path")
  override def name(): String = s"xetra_bars($path)"
  override def schema(): StructType = XetraBarsTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XetraBarsScanBuilder(path)
}

class XetraBarsScanBuilder(path: String) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = XetraBarsTable.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept the Date-shaped predicates for directory pruning; EVERYTHING
    // stays a residual (returned array) so Spark re-applies row-level
    pushed = filters.filter {
      case EqualTo("Date", _: String) => true
      case GreaterThan("Date", _: String) => true
      case GreaterThanOrEqual("Date", _: String) => true
      case LessThan("Date", _: String) => true
      case LessThanOrEqual("Date", _: String) => true
      case StringStartsWith("Date", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new XetraBarsScan(path, pushed, required)
}

class XetraBarsScan(path: String, pushed: Array[Filter],
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"XetraBars path=$path prunedBy=[${pushed.mkString(", ")}] " +
      s"columns=[${required.fieldNames.mkString(",")}]"

  /** One date directory survives iff its name satisfies every pushed Date
    * predicate (names are ISO dates, so lexicographic compare is order-
    * correct — the same property the reference's string filter relies on).
    */
  private def dateAdmitted(date: String): Boolean = pushed.forall {
    case EqualTo("Date", v: String) => date == v
    case GreaterThan("Date", v: String) => date > v
    case GreaterThanOrEqual("Date", v: String) => date >= v
    case LessThan("Date", v: String) => date < v
    case LessThanOrEqual("Date", v: String) => date <= v
    case StringStartsWith("Date", v) => date.startsWith(v)
    case _ => true
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val base = new Path(path)
    val fs = base.getFileSystem(new Configuration())
    if (!fs.exists(base)) return Array.empty
    fs.listStatus(base).iterator
      .filter(s => s.isDirectory && dateAdmitted(s.getPath.getName))
      .flatMap(d => fs.listStatus(d.getPath).iterator
        .filter(f => f.isFile && f.getPath.getName.endsWith(".csv"))
        .map(f => XetraBarsPartition(f.getPath.toString)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new XetraBarsReaderFactory(required)
}

case class XetraBarsPartition(file: String) extends InputPartition

class XetraBarsReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new XetraBarsReader(p.asInstanceOf[XetraBarsPartition].file, required)
}

/** Per-file CSV reader emitting only the pruned columns. Parse failures
  * null the cell (PERMISSIVE semantics, same as the engine's CSV path).
  */
class XetraBarsReader(file: String, required: StructType)
  extends PartitionReader[InternalRow] {

  private val full = XetraBarsTable.Schema
  private val colIdx = required.fields.map(f => full.fieldIndex(f.name))
  private val in = {
    val p = new Path(file)
    val fs = p.getFileSystem(new Configuration())
    new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
  }
  in.readLine() // header
  private var line: String = _

  override def next(): Boolean = { line = in.readLine(); line != null }

  override def get(): InternalRow = {
    val cells = line.split(",", -1)
    val values = colIdx.zip(required.fields).map { case (i, f) =>
      if (i >= cells.length || cells(i).isEmpty) null
      else f.dataType match {
        case StringType => UTF8String.fromString(cells(i))
        case DoubleType => try java.lang.Double.valueOf(cells(i).toDouble)
          catch { case _: NumberFormatException => null }
        case LongType => try java.lang.Long.valueOf(cells(i).toLong)
          catch { case _: NumberFormatException => null }
        case other => throw new IllegalStateException(s"unsupported $other")
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = in.close()
}
