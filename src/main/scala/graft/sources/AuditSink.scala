package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 WRITE connector — the write-audit half of the
  * connector rung (write-audit-publish is the standard lakehouse
  * gate: compute statistics WHILE writing, publish them atomically at
  * commit, abort leaves nothing behind). Each task's
  * [[AuditDataWriter]] folds its partition's rows into a bounded
  * stats accumulator (row count, per-column null count, and numeric
  * min/max/sum — O(columns) state regardless of row count); the
  * accumulators travel back as COMMIT MESSAGES and the driver merges
  * them and atomically renames the audit JSON into place at commit.
  * Nothing is written on abort, and a half-finished job leaves only
  * an invisible temp file — the classic commit-protocol contract.
  *
  * Scale: the only cross-node traffic is one O(columns) message per
  * task; rows never move. A billion-row audit costs the scan plus
  * |tasks| tiny messages.
  */
class AuditSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-audit"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only: schema comes from the query
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new AuditTable(schema, opts.get("path"), Option(opts.get("clusterBy")))
  }
}

private[sources] class AuditTable(schema0: StructType, path: String,
    clusterBy: Option[String])
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "graft-audit requires a path option")
  override def name(): String = s"graft-audit($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new AuditWrite(info.schema(), path, clusterBy)
    }
}

/** Per-column audit state: (nulls, and for numeric columns
  * min/max/sum). Serializable — it IS the commit message. */
private[sources] case class ColStats(nulls: Long, min: Double, max: Double,
    sum: Double, numeric: Boolean) {
  def merge(o: ColStats): ColStats = ColStats(nulls + o.nulls,
    math.min(min, o.min), math.max(max, o.max), sum + o.sum, numeric)
}

private[sources] case class AuditMessage(rows: Long, cols: Array[ColStats],
    sortedOk: Boolean = true, keyGroups: Long = 0L)
    extends WriterCommitMessage

/** The write plan contract (r9): with `option("clusterBy", col)` the
  * sink REQUIRES a hash-clustered distribution on that column plus an
  * ascending in-task sort ([[RequiresDistributionAndOrdering]] —
  * Spark inserts the exchange + sort; the sink never trusts the
  * query's incidental layout). The writer then counts key GROUPS as
  * key changes — exact because the required sort makes each task's
  * keys contiguous — and verifies the sort actually held. The commit
  * proof: Σ per-task groups equals the global distinct count IFF no
  * key straddles two tasks, so the published `key_groups` number is
  * a mechanical witness that the clustered distribution was enforced
  * (a round-robin layout double-counts straddled keys and the audit
  * diverges from the exact distinct — asserted in AuditSinkSpec). */
private[sources] class AuditWrite(schema: StructType, path: String,
    clusterBy: Option[String] = None)
    extends Write with RequiresDistributionAndOrdering {
  clusterBy.foreach { c =>
    require(schema.fieldNames.contains(c),
      s"clusterBy column '$c' not in write schema ${schema.fieldNames.mkString("[", ",", "]")}")
  }
  override def requiredDistribution(): Distribution =
    clusterBy.map { c =>
      Distributions.clustered(
        Array[org.apache.spark.sql.connector.expressions.Expression](
          Expressions.column(c)))
    }.getOrElse(Distributions.unspecified())
  override def requiredOrdering(): Array[SortOrder] =
    clusterBy.map(c => Array(
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)))
      .getOrElse(Array.empty)
  override def toBatch: BatchWrite = new AuditBatchWrite(schema, path, clusterBy)
}

private[sources] class AuditBatchWrite(schema: StructType, path: String,
    clusterBy: Option[String] = None)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(schema, clusterBy.map(schema.fieldIndex))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: AuditMessage => m }
    val rows = ms.map(_.rows).sum
    val merged = ms.map(_.cols).reduceOption { (a, b) =>
      a.zip(b).map { case (x, y) => x.merge(y) }
    }.getOrElse(schema.fields.map(f => AuditWriterFactory.zero(f.dataType)))
    // JSON-escape field names (quote/backslash/control chars would
    // otherwise produce an invalid audit file) and render non-finite
    // doubles as JSON strings — NaN/Infinity are not JSON literals.
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
      case ch => ch.toString
    }
    def num(v: Double): String =
      if (java.lang.Double.isFinite(v)) v.toString else "\"" + v.toString + "\""
    val json = new StringBuilder
    json.append(s"""{"rows": $rows, "columns": {""")
    json.append(schema.fields.zip(merged).map { case (f, c) =>
      val base = s""""${esc(f.name)}": {"nulls": ${c.nulls}"""
      if (c.numeric && rows - c.nulls > 0)
        base + s""", "min": ${num(c.min)}, "max": ${num(c.max)}, "sum": ${num(c.sum)}}"""
      else base + "}"
    }.mkString(", "))
    json.append("}")
    clusterBy.foreach { c =>
      val tasks = ms.count(_.rows > 0)
      val allSorted = ms.forall(_.sortedOk)
      val groups = ms.map(_.keyGroups).sum
      json.append(s""", "cluster": {"by": "${esc(c)}", "tasks": $tasks, """ +
        s""""sorted_within_tasks": $allSorted, "key_groups": $groups}""")
    }
    json.append("}")
    // atomic publish: write a temp sibling, rename into place
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling("." + p.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, json.toString)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] object AuditWriterFactory {
  def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }
  def zero(dt: DataType): ColStats =
    ColStats(0L, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, isNumeric(dt))
}

private[sources] class AuditWriterFactory(schema: StructType,
    clusterIdx: Option[Int] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditDataWriter(schema, clusterIdx)
}

private[sources] class AuditDataWriter(schema: StructType,
    clusterIdx: Option[Int] = None)
    extends DataWriter[InternalRow] {
  private var rows = 0L
  private val cols = schema.fields.map(f => AuditWriterFactory.zero(f.dataType))
  private val types = schema.fields.map(_.dataType)

  // cluster-key tracking (r9): the required ASC NULLS FIRST in-task
  // sort makes key changes an EXACT per-task distinct count; any
  // out-of-order arrival is recorded and fails the published claim
  private val keyOrd: Ordering[Any] = clusterIdx
    .map(i => TypeUtils.getInterpretedOrdering(types(i)))
    .getOrElse(null)
  private var sawKey = false
  private var prevNull = false
  private var prevKey: Any = null
  private var keyGroups = 0L
  private var sortedOk = true

  private def trackKey(record: InternalRow, i: Int): Unit = {
    val isNull = record.isNullAt(i)
    val v: Any =
      if (isNull) null
      else record.get(i, types(i)) match {
        // UnsafeRow string getters return views into a reused buffer
        case u: UTF8String => u.clone()
        case other => other
      }
    if (!sawKey) { sawKey = true; keyGroups = 1 }
    else {
      val changed = (isNull != prevNull) || (!isNull && keyOrd.compare(prevKey, v) != 0)
      if (changed) {
        keyGroups += 1
        // ASC NULLS FIRST: a null after a non-null, or a strict
        // decrease, means Spark did not deliver the required order
        if (isNull && !prevNull) sortedOk = false
        else if (!isNull && !prevNull && keyOrd.compare(prevKey, v) > 0) sortedOk = false
      }
    }
    prevNull = isNull; prevKey = v
  }

  override def write(record: InternalRow): Unit = {
    rows += 1
    clusterIdx.foreach(trackKey(record, _))
    var i = 0
    while (i < types.length) {
      val c = cols(i)
      if (record.isNullAt(i)) cols(i) = c.copy(nulls = c.nulls + 1)
      else if (c.numeric) {
        val v = types(i) match {
          case IntegerType => record.getInt(i).toDouble
          case LongType => record.getLong(i).toDouble
          case DoubleType => record.getDouble(i)
          case FloatType => record.getFloat(i).toDouble
          case ShortType => record.getShort(i).toDouble
          case ByteType => record.getByte(i).toDouble
          case d: DecimalType => record.getDecimal(i, d.precision, d.scale).toDouble
          case _ => 0.0
        }
        cols(i) = ColStats(c.nulls, math.min(c.min, v), math.max(c.max, v),
          c.sum + v, numeric = true)
      }
      i += 1
    }
  }
  override def commit(): WriterCommitMessage =
    AuditMessage(rows, cols, sortedOk, keyGroups)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
