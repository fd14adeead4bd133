package graft.sources

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.gen.EventGenerator

/** TableCatalog rung: the synthetic stream as a catalog-qualified SQL
  * table — every TableProvider pushdown must arrive through the
  * catalog identity too, because loadTable returns the same
  * EventsTable.
  */
class GraftCatalogSpec extends SparkSpec {

  private val N = 4000L

  private def registered(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.n", N.toString)
  }

  test("SELECT FROM graft.events equals the generator, pure SQL end to end") {
    registered()
    val viaCatalog = spark.sql("SELECT * FROM graft.events")
      .collect().map(_.toString).sorted.toSeq
    val expect = EventGenerator.events(spark, N)
      .collect().map(_.toString).sorted.toSeq
    assert(viaCatalog.size == N && viaCatalog == expect,
      "catalog read diverges from the generator")
    assert(spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("events"))
  }

  test("pushdowns survive the catalog path: closed-form count, day pruning") {
    registered()
    // complete COUNT(*) pushdown — no wire column in the scan schema
    val cnt = spark.sql("SELECT count(*) FROM graft.events")
    val scanSchema = cnt.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.readSchema()
    }
    assert(scanSchema.exists(_.fieldNames.forall(_.startsWith("count_"))),
      s"count(*) not pushed through the catalog: $scanSchema")
    assert(cnt.collect()(0).getLong(0) == N)
    // pushed range filter prunes day partitions before readers exist
    val pruned = spark.sql(
      "SELECT event_type FROM graft.events WHERE event_ts >= '2025-09-04T00:00:00Z'")
    assert(pruned.rdd.getNumPartitions == 4,
      s"day pruning lost through the catalog: ${pruned.rdd.getNumPartitions}")
    val exp = EventGenerator.events(spark, N)
      .where(col("event_ts") >= "2025-09-04T00:00:00Z").count()
    assert(pruned.count() == exp)
  }

  test("unknown tables and mutations fail loudly") {
    registered()
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM graft.nope").collect()
    }
    intercept[Exception] {
      spark.sql("DROP TABLE graft.events")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.extra (x INT) USING parquet")
    }
  }
}
