package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 connector exercise — the engine's demonstration of
  * the reference's pluggable source/sink stack: FLIP-27 `Source`
  * (flink-core/.../api/connector/source/Source.java:33 — split
  * enumeration ≈ `planInputPartitions`, reader ≈ `PartitionReader`) and
  * Sink V2 two-phase commit
  * (flink-core/.../api/connector/sink2/TwoPhaseCommittingSink.java —
  * writers produce committables, a committer publishes them atomically).
  *
  * `graftmem` is an in-memory table store with the full optimizer
  * contract: `SupportsPushDownFilters` (id/v comparisons evaluated inside
  * the reader — `.explain` shows them under PushedFilters, removed from
  * the post-scan), `SupportsPushDownRequiredColumns` (the reader emits
  * only the pruned columns), multi-partition scans, and a `BatchWrite`
  * whose rows become visible only in the driver-side `commit` — a failed
  * task aborts the job with the table state untouched (no partial
  * output), exactly the committable/committer split of the reference.
  */
object MemTables {
  /** table name → committed rows (id, name, v). */
  val tables = new java.util.concurrent.ConcurrentHashMap[String, Vector[(Long, String, Long)]]()

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("v", LongType, nullable = false)))

  // spec-visible diagnostics: what the LAST built scan actually received
  @volatile var lastPushedFilters: Seq[Filter] = Nil
  @volatile var lastReadSchema: StructType = schema
  @volatile var commits: Int = 0
  @volatile var aborts: Int = 0

  def reset(): Unit = {
    tables.clear(); lastPushedFilters = Nil; lastReadSchema = schema
    commits = 0; aborts = 0
  }
}

class GraftMemSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftmem"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemTables.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemTable(properties.get("table"))
}

class MemTable(tableName: String) extends Table with SupportsRead with SupportsWrite {
  require(tableName != null, "graftmem requires option 'table'")
  override def name(): String = s"graftmem:$tableName"
  override def schema(): StructType = MemTables.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(tableName)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(tableName)
}

class MemScanBuilder(tableName: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = MemTables.schema
  private var pushed: Array[Filter] = Array.empty

  private def supported(f: Filter): Boolean = f match {
    case EqualTo("id" | "v", _) | GreaterThan("id" | "v", _) |
         LessThan("id" | "v", _) | GreaterThanOrEqual("id" | "v", _) |
         LessThanOrEqual("id" | "v", _) | IsNotNull(_) => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(supported)
    pushed = sup
    residual // only these are re-evaluated above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    MemTables.lastPushedFilters = pushed.toSeq
    MemTables.lastReadSchema = required
    new MemScan(tableName, required, pushed)
  }
}

class MemScan(tableName: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surface pushdown in .explain like the built-in scans do
  override def description(): String =
    s"graftmem:$tableName PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // split enumeration (the FLIP-27 SplitEnumerator analogue): two
    // static splits so the distributed read path is actually exercised
    val rows = MemTables.tables.getOrDefault(tableName, Vector.empty)
    val (a, b) = rows.splitAt((rows.length + 1) / 2)
    Array(MemPartition(a), MemPartition(b))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MemReaderFactory(required.fieldNames, pushed)
}

case class MemPartition(rows: Seq[(Long, String, Long)]) extends InputPartition

class MemReaderFactory(fields: Array[String], pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[MemPartition].rows.iterator
    new PartitionReader[InternalRow] {
      private var current: (Long, String, Long) = _

      private def matches(r: (Long, String, Long)): Boolean = pushed.forall {
        case EqualTo(c, x) => field(r, c) == num(x)
        case GreaterThan(c, x) => field(r, c) > num(x)
        case LessThan(c, x) => field(r, c) < num(x)
        case GreaterThanOrEqual(c, x) => field(r, c) >= num(x)
        case LessThanOrEqual(c, x) => field(r, c) <= num(x)
        // the pushdown contract: Spark drops pushed filters from the
        // post-scan, so the reader MUST honor them — `name` is the one
        // nullable column, id/v are non-nullable by schema
        case IsNotNull(c) => c != "name" || r._2 != null
        case _ => true
      }
      private def field(r: (Long, String, Long), c: String): Long =
        if (c == "id") r._1 else r._3
      private def num(v: Any): Long = v.asInstanceOf[Number].longValue()

      override def next(): Boolean = {
        while (rows.hasNext) {
          val r = rows.next()
          if (matches(r)) { current = r; return true }
        }
        false
      }
      override def get(): InternalRow = InternalRow.fromSeq(fields.toSeq.map {
        case "id" => current._1
        case "name" => if (current._2 == null) null else UTF8String.fromString(current._2)
        case "v" => current._3
      })
      override def close(): Unit = ()
    }
  }
}

class MemWriteBuilder(tableName: String) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(tableName)
  }
}

/** Rows buffer per task (the writer's committable); only the driver-side
  * commit publishes them to the store — the two-phase split.
  */
case class MemCommit(rows: Seq[(Long, String, Long)]) extends WriterCommitMessage

class MemBatchWrite(tableName: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.flatMap(_.asInstanceOf[MemCommit].rows).toVector
    MemTables.tables.merge(tableName, all, (a, b) => a ++ b)
    MemTables.commits += 1
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // committables are discarded — nothing ever reached the table
    MemTables.aborts += 1
  }
}

class MemWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[(Long, String, Long)]
      override def write(record: InternalRow): Unit = {
        val name = if (record.isNullAt(1)) null else record.getUTF8String(1).toString
        // poison-row hook so specs can force a task failure mid-write
        if (name == "POISON") throw new RuntimeException("poison row")
        buf += ((record.getLong(0), name, record.getLong(2)))
      }
      override def commit(): WriterCommitMessage = MemCommit(buf.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
