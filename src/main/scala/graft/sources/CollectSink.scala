package graft.sources

import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo,
  PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder,
  WriterCommitMessage}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The write half of DataSource V2 (GenSource shows the read half):
  * a batch sink implementing the full two-phase commit protocol —
  * per-task DataWriters buffer and emit a WriterCommitMessage on task
  * commit; nothing becomes visible until the driver's BatchWrite
  * .commit() publishes ALL task messages atomically; abort() (task- or
  * job-level) leaves the published table untouched. That protocol is
  * exactly how exactly-once sinks work at 100 TB — except a real sink
  * commits file/manifest handles where this collector, built for
  * tests, carries the rows themselves (reference:
  * external/objects/ExternalTarget.scala — sclera's writable external
  * targets).
  *
  * `df.write.format("graft.sources.CollectSink").option("table", "t")
  *   .mode("append" | "overwrite").save()`
  */
class CollectSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CollectTable(
      properties.asScala.getOrElse("table", "default"), schema)
}

final class CollectTable(tableName: String, tableSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"collect:$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = {
        val doReplace = replace
        new Write {
          override def toBatch: BatchWrite =
            new CollectBatchWrite(tableName, info.schema(), doReplace)
        }
      }
    }
}

/** Task messages carry the buffered rows; publish happens here, once,
  * on the driver. */
final class CollectBatchWrite(
    tableName: String, schema: StructType, replace: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new CollectWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.iterator.flatMap {
      case m: CollectSink.RowsMessage => m.rows.iterator
      case _ => Iterator.empty
    }.toVector
    CollectSink.publish(tableName, rows, replace)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class CollectWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CollectWriter(schema)
}

/** Buffers this task's rows; they leave the task ONLY inside the
  * commit message — an aborted attempt publishes nothing. */
final class CollectWriter(schema: StructType)
    extends DataWriter[InternalRow] {
  private val buf = mutable.ArrayBuffer.empty[Seq[Any]]

  override def write(row: InternalRow): Unit =
    buf += schema.fields.zipWithIndex.map { case (f, i) =>
      row.get(i, f.dataType) match {
        case s: UTF8String => s.toString
        case v => v
      }
    }.toSeq

  override def commit(): WriterCommitMessage =
    CollectSink.RowsMessage(buf.toVector)

  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

object CollectSink {
  final case class RowsMessage(rows: Vector[Seq[Any]])
      extends WriterCommitMessage

  private val registry = mutable.Map.empty[String, Vector[Seq[Any]]]

  private[sources] def publish(
      name: String, rows: Vector[Seq[Any]], replace: Boolean): Unit =
    registry.synchronized {
      registry(name) =
        if (replace) rows
        else registry.getOrElse(name, Vector.empty) ++ rows
    }

  /** Published contents of a collected table (test observation). */
  def rows(name: String): Vector[Seq[Any]] =
    registry.synchronized { registry.getOrElse(name, Vector.empty) }

  def clear(name: String): Unit =
    registry.synchronized { registry.remove(name); () }
}
