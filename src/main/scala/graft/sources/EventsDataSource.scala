package graft.sources

import java.time.{Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, XxHash64Function}
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the deterministic synthetic event
  * stream — the CONNECTOR-API rung of the custom-extension ladder
  * (Expression → TypedImperativeAggregate → Generator → Rule →
  * Strategy/SparkPlan → TableProvider). `spark.read
  * .format("graft-events").option("n", …)` plans one InputPartition
  * per synthetic DAY, prunes those partitions against pushed
  * `event_ts` range filters BEFORE any reader is created (the
  * connector-level analogue of Hive partition pruning), and honors
  * column pruning by materializing only the fields Spark asks for —
  * an un-projected wire row never exists.
  *
  * Every value is bit-identical to [[graft.gen.EventGenerator]]'s
  * column-expression formulation (reference:
  * kafka/producer/produce_events.py:23-74): the same xxhash64-seeded
  * uniforms (`XxHash64Function` IS the interpreter behind the SQL
  * `xxhash64`), the same sha2-256 session surrogate, the same
  * HALF_EVEN bround on the decimal repr of the price double.
  * EventsSourceSpec pins row-set equality, the partition count after
  * pruning, and the pruned read schema.
  *
  * Scale: embarrassingly parallel — partition planning is O(days)
  * driver work (binary-searched exact id boundaries, so a pruned day
  * can never orphan a boundary row), readers are independent, and no
  * shuffle exists anywhere. Filters are re-evaluated by Spark after
  * the scan (pushFilters returns them all), so pruning is a pure
  * optimization that can never change semantics.
  */
class EventsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    EventsDataSource.requireUtcSession()
    EventsDataSource.WireSchema
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    EventsDataSource.requireUtcSession()
    new EventsTable(EventsConf(new CaseInsensitiveStringMap(properties)))
  }
}

object EventsDataSource {
  /** The producer wire schema (after the generator drops id/ts). */
  val WireSchema: StructType = StructType(Seq(
    StructField("event_ts", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("session_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("page", StringType, nullable = false),
    StructField("product_id", StringType, nullable = false),
    StructField("price", DoubleType, nullable = true),
    StructField("currency", StringType, nullable = false),
    StructField("referrer", StringType, nullable = false),
    StructField("user_agent", StringType, nullable = false)))

  private val MicrosPerDay = 86400000000L
  /** The connector renders `event_ts` in fixed UTC, while the
    * generator's column-expression formulation renders through the
    * SESSION time zone (unix_timestamp/date_format). The advertised
    * bit-identity therefore only holds under
    * `spark.sql.session.timeZone=UTC` (which [[graft.Tables.session]]
    * pins). Rather than silently diverge, table resolution
    * hard-rejects non-UTC sessions (r9, [[requireUtcSession]]). */
  private[sources] val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    .withZone(ZoneOffset.UTC)

  /** Loud guard for the UTC assumption above: called at
    * inferSchema/getTable time (driver-side, once per resolution), so
    * an embedder reading `format("graft-events")` under a non-UTC
    * session gets an actionable error instead of event_ts strings
    * that silently disagree with the generator. Any zone with a fixed
    * zero offset (UTC, Z, GMT, Etc/UTC, +00:00) is accepted. */
  private[sources] def requireUtcSession(): Unit = {
    val zone = java.time.ZoneId.of(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val isUtc = zone.normalized() == ZoneOffset.UTC
    require(isUtc,
      s"graft-events renders event_ts in UTC and requires " +
        s"spark.sql.session.timeZone=UTC for bit-identity with the " +
        s"generator; session zone is '$zone'. Set the conf or read the " +
        s"parquet fixture instead.")
  }

  /** Hidden provenance columns (SupportsMetadataColumns): the
    * synthetic row id — the stream's total order and the lineage key
    * a training-data pipeline carries through dedup/packing so any
    * emitted example can be traced back to its source event — and the
    * partition day index the planner pruned on. Absent from the wire
    * schema and from `SELECT *`; selecting them by name materializes
    * them per-row with zero cost for queries that don't ask. */
  private[sources] val EventIdCol = "_event_id"
  private[sources] val DayCol = "_day"

  /** Typical on-wire bytes per field (string payload or 8 for the
    * double) — drives SupportsReportStatistics' size estimate. */
  private[sources] val FieldBytes: Map[String, Long] = Map(
    "event_ts" -> 20L, "user_id" -> 6L, "session_id" -> 64L,
    "event_type" -> 9L, "page" -> 9L, "product_id" -> 7L,
    "price" -> 8L, "currency" -> 3L, "referrer" -> 6L,
    "user_agent" -> 11L, EventIdCol -> 8L, DayCol -> 4L)
  private[sources] val MetaCols: Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name: String = EventIdCol
      override def dataType: DataType = LongType
      override def isNullable: Boolean = false
      override def comment: String =
        "monotone synthetic row id — provenance/lineage key"
    },
    new MetadataColumn {
      override def name: String = DayCol
      override def dataType: DataType = IntegerType
      override def isNullable: Boolean = false
      override def comment: String =
        "zero-based partition day index (the unit of partition pruning)"
    })

  /** The one predicate-column test every pushdown shares: is this V2
    * expression a bare reference to event_ts? (top-N sort keys,
    * closed-form MIN/MAX columns, runtime filter attributes). */
  private[sources] def isEventTs(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference =>
        nr.fieldNames().sameElements(Array("event_ts"))
      case _ => false
    }

  /** seeded xxhash64 of (seed ++ id) exactly as the SQL
    * `xxhash64(concat(lit(seed), id.cast("string")))` computes it —
    * same interpreter object, same default seed 42. */
  private[sources] def xx(seed: String, id: Long): Long =
    XxHash64Function.hash(UTF8String.fromString(seed + id.toString),
      StringType, 42L)

  private def pmod(a: Long, m: Long): Long = { val r = a % m; if (r < 0) r + m else r }

  private[sources] def u01(seed: String, id: Long): Double =
    pmod(xx(seed, id), 1000000L).toDouble / 1000000.0

  private def pick(seed: String, id: Long, values: Seq[String]): String =
    values(pmod(xx(seed, id), values.size.toLong).toInt)

  private def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** Spark's BRound on DoubleType: HALF_EVEN over the decimal string
    * repr (BigDecimal.valueOf), not the binary value. */
  private def bround2(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(2, java.math.RoundingMode.HALF_EVEN).doubleValue()

  /** One wire field for event `id` — the row-wise twin of
    * EventGenerator.withEventColumns. */
  private[sources] def fieldValue(conf: EventsConf, field: String, id: Long): Any = {
    val seed = conf.seed
    field match {
      case "event_ts" =>
        val micros = conf.startMicros + (id.toDouble * conf.stepMicros).toLong
        UTF8String.fromString(
          TsFmt.format(Instant.ofEpochSecond(micros / 1000000L)) + "Z")
      case "user_id" =>
        UTF8String.fromString("u_" + (pmod(xx(s"$seed:uid", id), 2000L) + 1))
      case "session_id" =>
        UTF8String.fromString(sha256Hex(s"$seed:sess" + id.toString))
      case "event_type" => UTF8String.fromString(eventType(seed, id))
      case "page" => UTF8String.fromString(
        pick(s"$seed:page", id, Seq("/", "/search", "/product", "/cart", "/checkout")))
      case "product_id" =>
        UTF8String.fromString("sku_" + (pmod(xx(s"$seed:sku", id), 300L) + 1))
      case "price" =>
        if (eventType(seed, id) == "purchase")
          bround2(5.0 + u01(s"$seed:price", id) * 115.0)
        else null
      case "currency" => UTF8String.fromString("USD")
      case "referrer" => UTF8String.fromString(
        pick(s"$seed:ref", id, Seq("google", "email", "direct", "ads")))
      case "user_agent" => UTF8String.fromString("Mozilla/5.0")
      case EventIdCol => id
      case DayCol =>
        // same double arithmetic as event_ts, so _day always agrees
        // with the day the planner's binary search assigned the row to
        ((id.toDouble * conf.stepMicros).toLong / MicrosPerDay).toInt
    }
  }

  private def eventType(seed: String, id: Long): String = {
    val u = u01(s"$seed:et", id)
    if (u < 0.75) "page_view"
    else if (u < 0.90) "add_to_cart"
    else if (u < 0.97) "checkout"
    else "purchase"
  }

  /** Exact id boundary of day `d`: the smallest id whose derived
    * micros offset reaches d whole days — binary-searched with the
    * SAME double arithmetic the rows use, so a boundary row can never
    * land in the wrong partition. Shared by partition planning
    * (EventsScan) and the per-day closed-form aggregate pushdown
    * (r10), which must agree by construction. */
  private[sources] def dayBoundary(conf: EventsConf, d: Int): Long = {
    if (d <= 0) return 0L
    if (d >= conf.days) return conf.n
    val target = d.toLong * MicrosPerDay
    var lo = 0L; var hi = conf.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if ((mid.toDouble * conf.stepMicros).toLong >= target) hi = mid else lo = mid + 1
    }
    lo
  }
}

private[sources] case class EventsConf(n: Long, seed: String,
    startDate: String, days: Int, maxPerTrigger: Long = 0L,
    columnar: Boolean = true) {
  val startMicros: Long =
    LocalDate.parse(startDate).atStartOfDay(ZoneOffset.UTC).toEpochSecond * 1000000L
  val stepMicros: Double = days.toDouble * 86400 * 1e6 / n
}

private[sources] object EventsConf {
  def apply(o: CaseInsensitiveStringMap): EventsConf = EventsConf(
    n = o.getLong("n", 10000L),
    seed = o.getOrDefault("seed", "graft"),
    startDate = o.getOrDefault("startDate", "2025-09-01"),
    days = o.getInt("days", 7),
    maxPerTrigger = o.getLong("maxPerTrigger", 0L),
    columnar = o.getBoolean("columnar", true))
}

private[sources] class EventsTable(conf: EventsConf) extends Table
    with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"graft-events(n=${conf.n}, days=${conf.days})"
  override def schema(): StructType = EventsDataSource.WireSchema
  override def metadataColumns(): Array[MetadataColumn] = EventsDataSource.MetaCols
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventsScanBuilder(conf)
}

private[sources] class EventsScanBuilder(conf: EventsConf) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset {
  import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
  import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder}

  private var required: StructType = EventsDataSource.WireSchema
  private var pushed: Array[Filter] = Array.empty
  private var aggRows: Array[Array[Any]] = null
  private def countStarPushed: Boolean = aggRows != null
  // id range the scan will emit — limit / top-N pushdown clamps it
  private var idLo: Long = 0L
  private var idHi: Long = conf.n

  /** LIMIT k over an unordered scan may return ANY k rows, so the
    * deterministic source simply truncates its id range to the first
    * k ids — zero rows generated beyond the limit, partitions past
    * the cut never planned. Defensively refused when a time filter
    * was pushed: Spark only pushes a limit when no Filter node sits
    * between it and the scan, but if both ever co-occurred the
    * truncation would undercount (limit applies ABOVE the filter).
    * isPartiallyPushed stays true (the default): Spark keeps its own
    * limit, so the pushdown is a pure optimization. */
  override def pushLimit(limit: Int): Boolean = {
    if (pushed.nonEmpty || countStarPushed) false
    else { idHi = math.min(idHi, idLo + limit); true }
  }

  // both pushdown traits default this to true; Scala wants the
  // diamond resolved explicitly — and partial IS the contract here
  // (Spark keeps the final limit / TakeOrderedAndProject)
  override def isPartiallyPushed(): Boolean = true

  /** OFFSET m over an unordered scan may drop ANY m rows, so the
    * deterministic source advances its id range past the first m ids
    * — a COMPLETE pushdown (returning true removes the Offset node,
    * so the scan must skip exactly m rows, which an exact id shift
    * does; partitions wholly below the new floor are never planned,
    * the offset analogue of the limit truncation). Accepted only on a
    * pristine scan: a pushed filter would make the skip undercount
    * (offset applies above the filter), a prior limit/top-N clamp or
    * closed-form aggregate would compose ambiguously — Spark never
    * offers those combinations today (it only pushes offset when the
    * child is a bare scan, or after a FULLY pushed limit, which this
    * source never claims), so the guard is defensive. */
  override def pushOffset(offset: Int): Boolean = {
    if (pushed.nonEmpty || countStarPushed || idLo != 0L || idHi != conf.n) false
    else { idLo = math.min(conf.n, offset.toLong); true }
  }

  /** ORDER BY event_ts LIMIT k is closed-form: event_ts is monotone
    * non-decreasing in id, so the first k ids are a valid ascending
    * top-k and the last k a valid descending one. Partial pushdown —
    * Spark re-sorts and re-limits the ≤k survivors, which also makes
    * ties-at-the-boundary a non-issue (any minimal multiset is
    * acceptable input to the final TakeOrderedAndProject). */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (pushed.nonEmpty || countStarPushed || orders.length != 1) return false
    val o = orders(0)
    if (!EventsDataSource.isEventTs(o.expression())) return false
    // NullOrdering is irrelevant: event_ts is non-nullable
    if (o.direction() == SortDirection.ASCENDING)
      idHi = math.min(idHi, idLo + limit)
    else
      idLo = math.max(idLo, idHi - limit)
    true
  }

  /** COUNT(*), MIN(event_ts) and MAX(event_ts) — globally, or
    * grouped by the `_day` metadata column (r10) — with no residual
    * filters are closed-form for a synthetic source: count is an id
    * range width, and event_ts is monotone non-decreasing in id so
    * min/max are a range's first/last rows' timestamps. Grouping by
    * `_day` works because the stream is DAY-MONOTONE — each day is
    * exactly the id interval [dayBoundary(d), dayBoundary(d+1)), the
    * same binary-searched boundaries partition planning uses, so the
    * per-day answers have the same closed form as the global ones.
    * Answered from the driver without materializing a single event
    * row. Complete pushdown only: Spark plans no aggregate at all, so
    * the scan must emit the final one-row-per-group answer (one
    * partition — group rows must not split). Any residual filter or a
    * prior limit clamp disables this — the closed forms would ignore
    * them. */
  private def closedForm(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case m: Min => EventsDataSource.isEventTs(m.column())
    case m: Max => EventsDataSource.isEventTs(m.column())
    case _ => false
  }

  /** The only grouping shape with a closed form: a single bare
    * reference to the `_day` metadata column. */
  private def isDayGrouping(
      g: Array[org.apache.spark.sql.connector.expressions.Expression]): Boolean =
    g.length == 1 && (g(0) match {
      case nr: NamedReference =>
        nr.fieldNames().sameElements(Array(EventsDataSource.DayCol))
      case _ => false
    })

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    (aggregation.groupByExpressions().isEmpty ||
      isDayGrouping(aggregation.groupByExpressions())) &&
      pushed.isEmpty && idLo == 0L && idHi == conf.n &&
      aggregation.aggregateExpressions().nonEmpty &&
      aggregation.aggregateExpressions().forall(closedForm)

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (!supportCompletePushDown(aggregation)) false
    else {
      val exprs = aggregation.aggregateExpressions()
      val grouped = isDayGrouping(aggregation.groupByExpressions())
      // one closed-form id range per output row: the whole stream for
      // the global form, [dayBoundary(d), dayBoundary(d+1)) per
      // non-empty day for the grouped form (an empty id range is an
      // absent group, exactly like a row-level GROUP BY)
      val ranges: Seq[(Option[Int], Long, Long)] =
        if (grouped)
          (0 until conf.days).map(d =>
            (Some(d), EventsDataSource.dayBoundary(conf, d),
              EventsDataSource.dayBoundary(conf, d + 1)))
            .filter { case (_, s, e) => s < e }
        else Seq((None, 0L, conf.n))
      aggRows = ranges.map { case (day, s, e) =>
        val aggs = exprs.map {
          case _: CountStar => (e - s): Any
          case _: Min =>
            if (e > s) EventsDataSource.fieldValue(conf, "event_ts", s) else null
          case _: Max =>
            if (e > s) EventsDataSource.fieldValue(conf, "event_ts", e - 1) else null
        }
        day.map(d => (d: Any) +: aggs).getOrElse(aggs).toArray[Any]
      }.toArray
      // readSchema contract for a completely pushed aggregate:
      // grouping columns first, then the aggregates, in push order
      val aggFields = exprs.zipWithIndex.map {
        case (_: CountStar, i) => StructField(s"count_$i", LongType, nullable = false)
        case (_: Min, i) => StructField(s"min_$i", StringType, nullable = true)
        case (_: Max, i) => StructField(s"max_$i", StringType, nullable = true)
      }
      val groupFields =
        if (grouped) Seq(StructField(EventsDataSource.DayCol, IntegerType, nullable = false))
        else Seq.empty
      required = StructType(groupFields ++ aggFields)
      true
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case GreaterThan("event_ts", _: String) => true
      case GreaterThanOrEqual("event_ts", _: String) => true
      case LessThan("event_ts", _: String) => true
      case LessThanOrEqual("event_ts", _: String) => true
      case EqualTo("event_ts", _: String) => true
      case _ => false
    }
    // the source prunes whole day partitions but never filters rows:
    // hand every filter back for Spark-side evaluation, so pruning is
    // a pure optimization
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (!countStarPushed) required = requiredSchema
  override def build(): Scan =
    if (countStarPushed) new EventsAggScan(required, aggRows)
    else new EventsScan(conf, required, pushed, idLo, idHi)
}

/** The completely-pushed aggregate scan: one partition, one row per
  * group (one total for the global form), the closed-form answers —
  * zero event rows materialized anywhere. Single partition by
  * contract: with the aggregate node gone from the plan, rows of one
  * group must never split across partitions. */
private[sources] class EventsAggScan(schema: StructType, rows: Array[Array[Any]])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-events PushedAggregates=[${schema.fieldNames.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(EventsPartition(0L, 1L, "", ""))
  override def createReaderFactory(): PartitionReaderFactory = {
    val rs = rows
    (_: InputPartition) => new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rs.length }
      override def get(): InternalRow = new GenericInternalRow(rs(i).clone())
      override def close(): Unit = ()
    }
  }
}

private[sources] case class EventsPartition(start: Long, end: Long,
    minTs: String, maxTs: String) extends InputPartition

private[sources] class EventsScan(conf: EventsConf, required: StructType,
    pushed: Array[Filter], idLo: Long = 0L, idHi: Long = Long.MaxValue)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {
  import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  private val lo = math.max(0L, idLo)
  private val hi = math.min(conf.n, idHi)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-events pruned=[${pushed.mkString(", ")}] " +
      s"cols=${required.fieldNames.mkString(",")}" +
      (if (lo > 0L || hi < conf.n) s" idRange=[$lo,$hi)" else "")

  /** Runtime (DPP-style) day pruning: when this scan sits under an
    * equi-join on event_ts whose other side is small and selective,
    * Spark evaluates that side first and hands the surviving join
    * keys here as an IN predicate — BEFORE readers are created
    * (SPARK-35779's SupportsRuntimeV2Filtering contract). Day
    * partitions containing none of the keys are dropped at runtime,
    * the connector analogue of dynamic partition pruning on a Hive
    * table. Purely advisory: unparseable predicates are ignored and
    * Spark re-evaluates the join condition on every surviving row. */
  @volatile private var runtimeTsKeys: Option[Set[String]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("event_ts"))

  override def filter(predicates: Array[Predicate]): Unit = {
    def isTs(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      EventsDataSource.isEventTs(e)
    def litStr(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case l: Literal[_] if l.dataType == StringType =>
          Option(l.value).map(_.toString)
        case _ => None
      }
    val keySets = predicates.flatMap { p =>
      val c = p.children()
      p.name() match {
        case "IN" if c.length >= 2 && isTs(c(0)) =>
          val lits = c.drop(1).flatMap(litStr(_))
          if (lits.length == c.length - 1) Some(lits.toSet) else None
        case "=" if c.length == 2 && isTs(c(0)) => litStr(c(1)).map(Set(_))
        case "=" if c.length == 2 && isTs(c(1)) => litStr(c(0)).map(Set(_))
        case _ => None
      }
    }
    if (keySets.nonEmpty) runtimeTsKeys = Some(keySets.reduce(_ intersect _))
  }

  /** Post-pruning exact row count + width-aware byte estimate, so the
    * optimizer sees a day-pruned / limit-clamped scan at its REAL
    * size — a filtered slice of a huge synthetic table becomes
    * broadcast-eligible instead of inheriting the default
    * size (which would force a shuffle join). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows: Long = planInputPartitions()
      .map { case p: EventsPartition => p.end - p.start }.sum
    private val rowWidth: Long = required.fieldNames.map { f =>
      EventsDataSource.FieldBytes.getOrElse(f, 16L)
    }.sum.max(1L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * rowWidth)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  private def dayBoundary(d: Int): Long = EventsDataSource.dayBoundary(conf, d)

  private def fmt(offsetMicros: Long): String = {
    val micros = conf.startMicros + offsetMicros
    EventsDataSource.TsFmt.format(Instant.ofEpochSecond(micros / 1000000L)) + "Z"
  }

  private def overlaps(minTs: String, maxTs: String): Boolean = pushed.forall {
    case GreaterThan("event_ts", v: String) => maxTs > v
    case GreaterThanOrEqual("event_ts", v: String) => maxTs >= v
    case LessThan("event_ts", v: String) => minTs < v
    case LessThanOrEqual("event_ts", v: String) => minTs <= v
    case EqualTo("event_ts", v: String) => minTs <= v && v <= maxTs
    case _ => true
  }

  // a day survives a runtime IN filter iff it contains at least one
  // surviving join key (an empty key set prunes every partition —
  // the join is provably empty)
  private def survivesRuntime(minTs: String, maxTs: String): Boolean =
    runtimeTsKeys.forall(_.exists(v => minTs <= v && v <= maxTs))

  private def planParts(): Array[InputPartition] =
    (0 until conf.days).iterator.map { d =>
      EventsPartition(math.max(dayBoundary(d), lo),
        math.min(dayBoundary(d + 1), hi),
        fmt(d.toLong * 86400000000L), fmt((d + 1).toLong * 86400000000L - 1L))
    }.filter(p => p.start < p.end && overlaps(p.minTs, p.maxTs) &&
        survivesRuntime(p.minTs, p.maxTs))
      .toArray[InputPartition]

  // pushed-filter/limit pruning is fixed at build time, so the planning
  // (day-boundary binary searches + ts formatting) is cached; only a
  // runtime filter() arriving later can change the answer, and that
  // path re-plans fresh
  private lazy val baseParts: Array[InputPartition] = planParts()
  override def planInputPartitions(): Array[InputPartition] =
    if (runtimeTsKeys.isEmpty) baseParts else planParts()

  override def createReaderFactory(): PartitionReaderFactory =
    new EventsReaderFactory(conf, required.fieldNames, columnar = conf.columnar)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EventsMicroBatchStream(conf, required.fieldNames)
}

/** Streaming half of the connector: the offset is simply the next
  * unread id (a total order the synthetic stream already has), so a
  * micro-batch is an id range — replayable, exactly-once under the
  * checkpoint by construction. Implements admission control
  * (`maxPerTrigger` rows per batch) and Trigger.AvailableNow (drain
  * to the configured n in rate-limited batches, then stop). */
private[sources] class EventsMicroBatchStream(conf: EventsConf,
    fields: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  override def initialOffset(): Offset = EventsOffset(0L)
  override def deserializeOffset(json: String): Offset = EventsOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    if (conf.maxPerTrigger > 0) ReadLimit.maxRows(conf.maxPerTrigger)
    else ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this source")
  override def reportLatestOffset(): Offset = EventsOffset(conf.n)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EventsOffset].id
    val step = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => conf.n
    }
    EventsOffset(math.min(conf.n, s + step))
  }
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventsOffset].id
    val e = end.asInstanceOf[EventsOffset].id
    if (s >= e) Array.empty
    else Array(EventsPartition(s, e, "", ""))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new EventsReaderFactory(conf, fields)
}

private[sources] case class EventsOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

private[sources] class EventsReaderFactory(conf: EventsConf,
    fields: Array[String], columnar: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EventsPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow =
        new GenericInternalRow(
          fields.map(f => EventsDataSource.fieldValue(conf, f, id)).toArray[Any])
      override def close(): Unit = ()
    }
  }

  /** Vectorized read path: rows are emitted as 4K-row ColumnarBatches
    * into on-heap column vectors, so the scan enters Spark's columnar
    * execution (`BatchScanExec.supportsColumnar`) and downstream
    * whole-stage codegen consumes vectors instead of one
    * GenericInternalRow allocation per row — the same shape a
    * vectorized parquet reader hands Spark. Batch-only (the
    * micro-batch stream keeps the row path; columnar streaming scans
    * gain nothing at trigger-sized batches). */
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[EventsPartition]
    new PartitionReader[ColumnarBatch] {
      private val Cap = 4096
      private val types: Array[DataType] = fields.map {
        case "price" => DoubleType
        case EventsDataSource.EventIdCol => LongType
        case EventsDataSource.DayCol => IntegerType
        case _ => StringType
      }
      private val vectors: Array[OnHeapColumnVector] =
        types.map(t => new OnHeapColumnVector(Cap, t))
      private val batch = new ColumnarBatch(vectors.toArray[
        org.apache.spark.sql.vectorized.ColumnVector])
      private var id = p.start

      override def next(): Boolean = {
        if (id >= p.end) return false
        val m = math.min(Cap.toLong, p.end - id).toInt
        var c = 0
        while (c < fields.length) {
          val v = vectors(c)
          v.reset()
          val f = fields(c)
          var i = 0
          while (i < m) {
            EventsDataSource.fieldValue(conf, f, id + i) match {
              case null => v.putNull(i)
              case s: UTF8String => v.putByteArray(i, s.getBytes)
              case d: Double => v.putDouble(i, d)
              case l: Long => v.putLong(i, l)
              case n: Int => v.putInt(i, n)
              case other => throw new IllegalStateException(
                s"unexpected wire value ${other.getClass} for $f")
            }
            i += 1
          }
          c += 1
        }
        batch.setNumRows(m)
        id += m
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}
