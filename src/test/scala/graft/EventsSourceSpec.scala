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

  test("short name resolves through DataSourceRegister") {
    // format("graft-events") (not the class name) already proves the
    // service registration; double-check a misspelling fails loudly
    intercept[Exception] { spark.read.format("graft-eventz").load() }
  }
}
