package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.gen.EventGenerator

/** DataSourceV2 connector (graft-events): bit-identical to the
  * column-expression generator, day-partition pruning driven by
  * pushed event_ts filters, and connector-level column pruning.
  */
class EventsSourceSpec extends SparkSpec {

  private val N = 5000L

  private def viaSource = spark.read.format("graft-events")
    .option("n", N).load()

  test("non-UTC session is rejected loudly at table resolution (r9)") {
    // the connector renders event_ts in fixed UTC while the generator
    // renders through the session zone — bit-identity requires UTC,
    // and a silent divergence is worse than an error
    val key = "spark.sql.session.timeZone"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "America/New_York")
      val e = intercept[Exception] { viaSource.collect() }
      def msgs(t: Throwable): List[String] =
        if (t == null) Nil else Option(t.getMessage).toList ::: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("requires spark.sql.session.timeZone=UTC")),
        s"unexpected failure shape: $e")
    } finally spark.conf.set(key, saved)
    // and a zero-offset alias is accepted
    try {
      spark.conf.set(key, "Etc/UTC")
      assert(viaSource.limit(1).count() == 1L)
    } finally spark.conf.set(key, saved)
  }

  test("source rows are bit-identical to EventGenerator's") {
    val a = viaSource.collect().map(_.toString).sorted.toSeq
    val b = EventGenerator.events(spark, N).collect().map(_.toString).sorted.toSeq
    assert(a.size == N && a == b,
      "DSv2 row-wise derivation diverged from the column-expression twin")
  }

  test("pushed event_ts range filter prunes whole day partitions") {
    val cut = "2025-09-04T00:00:00Z"
    val filtered = viaSource.where(col("event_ts") >= cut)
    // 7 synthetic days, filter keeps the last 4 — planning must prune
    // the first 3 BEFORE any reader exists
    assert(filtered.rdd.getNumPartitions == 4,
      s"expected 4 surviving day partitions, got ${filtered.rdd.getNumPartitions}")
    // pruning must be a pure optimization: same rows as the unpruned twin
    val expect = EventGenerator.events(spark, N)
      .where(col("event_ts") >= cut).collect().map(_.toString).sorted.toSeq
    assert(filtered.collect().map(_.toString).sorted.toSeq == expect)
    // and an unsatisfiable range prunes everything
    assert(viaSource.where(col("event_ts") >= "2030-01-01").rdd.getNumPartitions == 0)
  }

  test("column pruning reaches the connector: scan schema is the projection") {
    val df = viaSource.select(col("event_type"))
    val scanSchema = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.readSchema()
    }
    assert(scanSchema.isDefined, "no BatchScanExec in the plan")
    assert(scanSchema.get.fieldNames.toSeq == Seq("event_type"),
      s"scan materializes ${scanSchema.get.fieldNames.mkString(",")}")
    assert(df.count() == N)
  }

  test("micro-batch stream drains rate-limited under AvailableNow, equals the batch read") {
    import org.apache.spark.sql.streaming.Trigger
    val q = spark.readStream.format("graft-events")
      .option("n", 3000L).option("maxPerTrigger", 1000L)
      .load()
      .writeStream.format("memory").queryName("dsv2_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3,
      s"admission control ignored: drained in $batches batch(es)")
    val got = spark.table("dsv2_stream").collect().map(_.toString).sorted.toSeq
    val expect = spark.read.format("graft-events").option("n", 3000L)
      .load().collect().map(_.toString).sorted.toSeq
    assert(got.size == 3000 && got == expect,
      "streamed rows diverge from the batch read")
  }

  private def scanSchemaOf(df: org.apache.spark.sql.DataFrame) = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectFirst { case b: BatchScanExec => b.scan.readSchema() }
  }

  test("COUNT(*) is answered closed-form by the connector (complete agg pushdown)") {
    val df = viaSource.agg(count(lit(1)))
    val scanSchema = scanSchemaOf(df)
    assert(scanSchema.isDefined)
    // the scan's schema IS the count column — no wire field survives
    assert(scanSchema.get.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType),
      s"scan still materializes ${scanSchema.get.catalogString}")
    assert(scanSchema.get.fieldNames.forall(_.startsWith("count_")),
      s"aggregate not pushed: ${scanSchema.get.fieldNames.mkString(",")}")
    assert(df.head().getLong(0) == N)
    // a residual row filter must DISABLE the pushdown (the closed-form
    // count would ignore it)
    val filtered = viaSource.where(col("event_type") === "purchase").agg(count(lit(1)))
    val fSchema = scanSchemaOf(filtered).get
    assert(fSchema.fieldNames.contains("event_type"),
      "pushdown must not swallow a residual filter")
    val exp = EventGenerator.events(spark, N)
      .where(col("event_type") === "purchase").count()
    assert(filtered.head().getLong(0) == exp)
  }

  private def scanDescOf(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectFirst { case b: BatchScanExec => b.scan.description() }.getOrElse("")
  }

  test("LIMIT pushdown truncates the id range: no row generated past the cut") {
    val df = viaSource.limit(100)
    assert(scanDescOf(df).contains("idRange=[0,100)"),
      s"limit not pushed: ${scanDescOf(df)}")
    // 100 < one synthetic day, so a single partition survives planning
    assert(df.rdd.getNumPartitions == 1)
    // ids are monotone in event_ts, so the first 100 ids ARE the
    // 100 earliest events — comparable against the sorted generator
    val expect = EventGenerator.events(spark, N).orderBy(col("event_ts"))
      .limit(100).collect().map(_.toString).sorted.toSeq
    assert(df.collect().map(_.toString).sorted.toSeq == expect)
    // a residual row filter blocks the pushdown (Filter sits between
    // the limit and the scan — truncating would undercount)
    val guarded = viaSource.where(col("event_type") === "purchase").limit(5)
    assert(!scanDescOf(guarded).contains("idRange"),
      "limit must not push past a residual filter")
    assert(guarded.count() == 5)
  }

  test("OFFSET pushdown shifts the id floor: skipped day partitions never planned (r9)") {
    val base = spark.read.format("graft-events").option("n", N).load()
    // 7 synthetic days ⇒ N/7 ids per day; an offset past day 0 must
    // drop that partition at PLANNING time (the offset analogue of
    // the limit truncation)
    val perDay = N / 7
    val off = base.offset((perDay + 3).toInt)
    assert(off.rdd.getNumPartitions == 6,
      "offset did not prune the wholly-skipped day partition")
    assert(off.count() == N - perDay - 3, "offset must skip exactly m rows")
    // exactly the first (lowest-id) rows are the ones skipped: the
    // survivors equal the generator's rows minus the lowest-id prefix
    val survivors = off.collect().map(_.toString).sorted.toSeq
    val expected = viaSource.collect().map(_.toString).sorted.toSeq
    // event_ts is monotone in id and the wire row embeds it first, so
    // lexicographic row-string order == id order for this fixture size
    assert(survivors == expected.drop(perDay.toInt + 3),
      "offset skipped rows other than the id prefix")
  }

  test("ORDER BY event_ts LIMIT k pushes as a closed-form top-N id range") {
    val asc = viaSource.orderBy(col("event_ts")).limit(50)
    assert(scanDescOf(asc).contains("idRange=[0,50)"),
      s"asc top-N not pushed: ${scanDescOf(asc)}")
    val expectAsc = EventGenerator.events(spark, N).orderBy(col("event_ts"))
      .limit(50).collect().map(_.toString).sorted.toSeq
    assert(asc.collect().map(_.toString).sorted.toSeq == expectAsc)

    val desc = viaSource.orderBy(col("event_ts").desc).limit(50)
    assert(scanDescOf(desc).contains(s"idRange=[${N - 50},$N)"),
      s"desc top-N not pushed: ${scanDescOf(desc)}")
    val expectDesc = EventGenerator.events(spark, N).orderBy(col("event_ts").desc)
      .limit(50).collect().map(_.toString).sorted.toSeq
    assert(desc.collect().map(_.toString).sorted.toSeq == expectDesc)

    // a non-time sort key must NOT push (the source is only ordered
    // by event_ts) — Spark plans its own global TakeOrdered instead
    val other = viaSource.orderBy(col("user_id")).limit(50)
    assert(!scanDescOf(other).contains("idRange"))
    assert(other.count() == 50)
  }

  test("reported statistics shrink with pruning, making the slice broadcastable") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    def statsOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r.stats
      }.get
    val full = statsOf(viaSource)
    assert(full.rowCount.contains(BigInt(N)),
      s"full-scan rowCount ${full.rowCount} != $N")
    // day pruning: the 4 surviving days' exact row count, and bytes
    // shrink proportionally — the optimizer sees the slice's REAL size
    val sliced = viaSource.where(col("event_ts") >= "2025-09-04T00:00:00Z")
    val s = statsOf(sliced)
    val expectRows = EventGenerator.events(spark, N)
      .where(col("event_ts") >= "2025-09-04T00:00:00Z").count()
    assert(s.rowCount.contains(BigInt(expectRows)),
      s"pruned rowCount ${s.rowCount} != $expectRows")
    assert(s.sizeInBytes < full.sizeInBytes)
    // and a pruned slice joined to a large table broadcasts: the
    // reported size is under the 10MB default threshold
    assert(s.sizeInBytes < 10L * 1024 * 1024)
  }

  test("columnar read path: vectorized batches, bit-identical to the row path") {
    val colDf = viaSource // columnar defaults on for batch reads
    val colScan = colDf.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(colScan.supportsColumnar, "batch scan did not enter columnar mode")
    val rowDf = spark.read.format("graft-events")
      .option("n", N).option("columnar", false).load()
    val rowScan = rowDf.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(!rowScan.supportsColumnar, "columnar=false must keep the row path")
    // identical rows either way — including the null prices that
    // exercise the vector's null bitmap
    val a = colDf.collect().map(_.toString).sorted.toSeq
    val b = rowDf.collect().map(_.toString).sorted.toSeq
    assert(a == b, "columnar and row reads diverge")
    assert(colDf.where(col("price").isNull).count() ==
      rowDf.where(col("price").isNull).count())
  }

  test("metadata columns: hidden from SELECT *, selectable by name, pruned-consistent") {
    // hidden: the wire schema and a plain read never carry them
    assert(!viaSource.schema.fieldNames.exists(Set("_event_id", "_day")))
    // selectable: provenance id is the stream's total order — it must
    // agree with the event_ts sort order and be unique
    val df = viaSource.select(col("_event_id"), col("_day"), col("event_ts"))
    val rows = df.collect()
    assert(rows.length == N)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == N, "_event_id must be unique")
    val tsInIdOrder = rows.sortBy(_.getLong(0)).map(_.getString(2))
    assert(tsInIdOrder.sliding(2).forall {
      case Array(a, b) => a <= b
      case _ => true
    }, "_event_id order must agree with event_ts order")
    // _day agrees with the calendar day derived from event_ts
    val bad = df.where(
      col("_day") =!= datediff(to_date(substring(col("event_ts"), 1, 10)),
        lit("2025-09-01"))).count()
    assert(bad == 0, s"$bad rows where _day disagrees with event_ts's day")
    // pruning composes: a day filter keeps _day values consistent and
    // partition count pruned
    val pruned = viaSource.where(col("event_ts") >= "2025-09-04T00:00:00Z")
      .select(col("_day"))
    assert(pruned.rdd.getNumPartitions == 4)
    assert(pruned.distinct().collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 4, 5, 6))
    // and the columnar path carries the long/int vectors
    val viaColumnar = viaSource.select(col("_event_id")).agg(sum(col("_event_id")))
    assert(viaColumnar.head().getLong(0) == N * (N - 1) / 2)
  }

  test("MIN/MAX(event_ts) push down closed-form alongside COUNT(*)") {
    val df = viaSource.agg(count(lit(1)).as("n"),
      min(col("event_ts")).as("lo"), max(col("event_ts")).as("hi"))
    val schema = scanSchemaOf(df).get
    assert(schema.fieldNames.sameElements(Array("count_0", "min_1", "max_2")),
      s"aggregates not completely pushed: ${schema.fieldNames.mkString(",")}")
    val r = df.head()
    val exp = EventGenerator.events(spark, N)
      .agg(count(lit(1)), min(col("event_ts")), max(col("event_ts"))).head()
    assert(r.getLong(0) == exp.getLong(0) && r.getString(1) == exp.getString(1)
      && r.getString(2) == exp.getString(2),
      s"closed-form agg diverges: $r vs $exp")
    // min/max on a NON-monotone column must NOT push — Spark keeps its
    // own aggregate over the wire rows
    val other = viaSource.agg(min(col("user_id")))
    val oSchema = scanSchemaOf(other).get
    assert(oSchema.fieldNames.contains("user_id"),
      "min(user_id) has no closed form and must not push")
    assert(other.head().getString(0) ==
      EventGenerator.events(spark, N).agg(min(col("user_id"))).head().getString(0))
  }

  test("short name resolves through DataSourceRegister") {
    // format("graft-events") (not the class name) already proves the
    // service registration; double-check a misspelling fails loudly
    intercept[Exception] { spark.read.format("graft-eventz").load() }
  }
}
