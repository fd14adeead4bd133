package graft.sources

import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SupportsRuntimeV2Filtering on the graft-events scan: runtime
  * (DPP-style) day pruning driven by the surviving join keys of an
  * equi-join on event_ts. Unit level pins the predicate→pruning
  * contract; plan level proves Spark actually injects the dynamic
  * filter and the connector prunes before readers exist.
  */
class EventsRuntimeFilterSpec extends SparkSpec {

  private val N = 5000L
  private def conf = EventsConf(N, "graft", "2025-09-01", 7)

  private def freshScan: EventsScan =
    new EventsScanBuilder(conf).build().asInstanceOf[EventsScan]

  private def inPredicate(values: String*): Predicate =
    new Predicate("IN",
      (Expressions.column("event_ts") +:
        values.map(v => Expressions.literal(v))).toArray[Expression])

  test("runtime IN predicate prunes to the days containing the keys") {
    val scan = freshScan
    assert(scan.toBatch.planInputPartitions().length == 7)
    // two keys, both inside day 3 — one day survives
    scan.filter(Array(inPredicate("2025-09-04T06:00:00Z", "2025-09-04T18:00:00Z")))
    assert(scan.toBatch.planInputPartitions().length == 1,
      "runtime keys in one day must leave one partition")
    // keys spanning two days
    val scan2 = freshScan
    scan2.filter(Array(inPredicate("2025-09-02T12:00:00Z", "2025-09-06T12:00:00Z")))
    assert(scan2.toBatch.planInputPartitions().length == 2)
    // equality form
    val scan3 = freshScan
    scan3.filter(Array(new Predicate("=", Array[Expression](
      Expressions.column("event_ts"),
      Expressions.literal("2025-09-03T00:00:01Z")))))
    assert(scan3.toBatch.planInputPartitions().length == 1)
  }

  test("unparseable or foreign runtime predicates are ignored (advisory contract)") {
    val scan = freshScan
    scan.filter(Array(new Predicate("IN", Array[Expression](
      Expressions.column("user_id"), Expressions.literal("u_1")))))
    assert(scan.toBatch.planInputPartitions().length == 7,
      "a filter on a non-time column must not prune anything")
    val scan2 = freshScan
    scan2.filter(Array(new Predicate("ALWAYS_TRUE", Array.empty)))
    assert(scan2.toBatch.planInputPartitions().length == 7)
    // an IN with zero literal children (empty build side) is ignored
    // too — Spark already knows the join is empty
    val scan3 = freshScan
    scan3.filter(Array(new Predicate("IN",
      Array[Expression](Expressions.column("event_ts")))))
    assert(scan3.toBatch.planInputPartitions().length == 7)
  }

  test("join on event_ts injects a dynamic filter; connector prunes at runtime") {
    val events = spark.read.format("graft-events").option("n", N).load()
    // three REAL event_ts keys, all from the last synthetic day
    val keys = events.where(col("event_ts") >= "2025-09-07T00:00:00Z")
      .select("event_ts").distinct().limit(3).collect().map(_.getString(0)).toSeq
    assert(keys.size == 3)
    import spark.implicits._
    // the dim must NOT be a LocalRelation: the optimizer pre-evaluates
    // Filter(LocalRelation), leaving no selective predicate for the
    // PartitionPruning rule to key on — a parquet round-trip keeps the
    // Filter node (exactly how a real dimension table arrives)
    val dimPath = java.nio.file.Files.createTempDirectory("rtf_dim")
    val dimDir = dimPath.toString
    try {
    (keys.map((_, "keep")) :+ (("2030-01-01T00:00:00Z", "drop")))
      .toDF("ts", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // the selective dim filter is what makes DPP consider the join
    val joined = events.join(dim.where(col("tag") === "keep"),
      events("event_ts") === dim("ts"))
    val rows = joined.collect()
    // correctness first: exactly the events carrying those timestamps
    val expect = events.where(col("event_ts").isin(keys: _*)).count()
    assert(rows.length.toLong == expect && expect >= 3)

    val scanExec = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[BatchScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case b: BatchScanExec => Seq(b)
        case other => other.children.flatMap(scans)
      }
      scans(joined.queryExecution.executedPlan)
        .find(_.scan.isInstanceOf[EventsScan])
    }
    assert(scanExec.isDefined, "no EventsScan in the executed plan")
    assert(scanExec.get.runtimeFilters.nonEmpty,
      "Spark injected no runtime filter — SupportsRuntimeV2Filtering unused")
    // after execution the scan instance holds the runtime keys: it
    // must re-plan to exactly the day(s) containing them
    val prunedParts = scanExec.get.scan.toBatch.planInputPartitions().length
    assert(prunedParts == 1,
      s"runtime pruning left $prunedParts partitions, expected 1 (keys in one day)")
    } finally {
      // recursive temp cleanup — repeated test runs must not accumulate
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dimPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
