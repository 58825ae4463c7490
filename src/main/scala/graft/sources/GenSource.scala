package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{
  DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 table: deterministic synthetic rows generated
  * directly on the executors (reference: external/ virtual data
  * sources — sclera's external sources materialize relations on
  * demand; this is the Spark-native equivalent, a TableProvider).
  *
  * `spark.read.format("graft.sources.GenSource")
  *   .option("rows", n).option("parts", p).load()`
  *
  * Schema: id BIGINT, bucket INT, score DOUBLE, tok STRING — all
  * deterministic functions of id (portable integer arithmetic, so a
  * SQL oracle reproduces the table exactly from range()).
  *
  * Scale behavior, the point of the exercise:
  *  - PARTITIONED GENERATION: the id range splits into `parts` input
  *    partitions; a 100-TB synthetic corpus materializes in parallel
  *    with no files and no driver involvement.
  *  - FILTER PUSHDOWN (SupportsPushDownFilters): id-range predicates
  *    narrow the generated range itself — `WHERE id < 1000` generates
  *    1000 rows, not 10^9-filtered-to-1000. Non-id filters stay
  *    post-scan.
  *  - COLUMN PRUNING (SupportsPushDownRequiredColumns): the reader
  *    materializes only the requested fields.
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(
      properties.asScala.getOrElse("rows", "100000").toLong,
      properties.asScala.getOrElse("parts", "8").toInt)

  override def supportsExternalMetadata(): Boolean = false
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("tok", StringType, nullable = false)))

  /** Portable integer mix, identical in any engine's BIGINT arithmetic. */
  def bucketOf(id: Long): Int = (((id * 2654435761L) % 2147483647L) % 100).toInt
}

class GenTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, parts)
}

class GenScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GenSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case GreaterThanOrEqual("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case EqualTo("id", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case GreaterThan(_, v: Long) => lo = math.max(lo, v + 1)
      case LessThan(_, v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: Long) => hi = math.min(hi, v + 1)
      case EqualTo(_, v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    accepted = ours
    rest // id-range application is exact; only the rest stays post-scan
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GenScan(lo, math.max(lo, hi), parts, required)
}

class GenScan(lo: Long, hi: Long, parts: Int, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft_gen[$lo,$hi) parts=$parts"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    val p = math.max(1, math.min(parts.toLong, n).toInt)
    (0 until p).map { i =>
      GenPartition(lo + n * i / p, lo + n * (i + 1) / p): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames)
}

case class GenPartition(start: Long, end: Long) extends InputPartition

class GenReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenPartition]
    new GenReader(p.start, p.end, fields)
  }
}

class GenReader(start: Long, end: Long, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private var id = start - 1

  override def next(): Boolean = { id += 1; id < end }

  override def get(): InternalRow = {
    // materialize only the pruned columns, in the pruned order
    val values: Array[Any] = fields.map {
      case "id" => id
      case "bucket" => GenSource.bucketOf(id)
      case "score" => GenSource.bucketOf(id) / 100.0
      case "tok" => UTF8String.fromString("t" + (id % 997))
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = ()
}
