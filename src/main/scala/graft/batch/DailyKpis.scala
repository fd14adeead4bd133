package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.EventSchema

/** Reference-parity daily KPI job over raw JSONL
  * (reference: airflow/dags/daily_kpis.py — partition-pruned scan →
  * single-pass fold → one KPI row per day → snappy parquet).
  *
  * Spark-first restatement (SURVEY.md §3 EP3):
  *  - the per-day Airflow run (`catchup=True`, ≤16 parallel day-runs)
  *    becomes ONE distributed job grouped by event date — per-day
  *    parallelism becomes intra-job partition parallelism;
  *  - the S3-prefix partition prune (daily_kpis.py:155-156) becomes a
  *    partition-column filter Catalyst pushes into the file scan;
  *  - malformed JSON lines are dropped via PERMISSIVE mode +
  *    corrupt-record filter — count-identical to the reference's
  *    `except: continue` (daily_kpis.py:104-107);
  *  - revenue rounding uses F.roundBin (round-half-up on the binary
  *    double, matching DuckDB/SQL `round()`), a documented deviation
  *    from Python's `round` (daily_kpis.py:139, HALF_EVEN on the
  *    shortest decimal repr) — bround here would diverge from the
  *    q_raw_kpis oracle on sums whose shortest repr shows x.xx5 while
  *    the binary value sits below the half.
  */
object DailyKpis {

  /** Read raw JSONL (optionally Hive-partitioned by date=/hour=). */
  def readRaw(spark: SparkSession, rawPath: String): DataFrame =
    spark.read
      .schema(EventSchema.schemaWithCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", EventSchema.CorruptCol)
      .json(rawPath)

  import graft.model.EventPredicates.{isPageview, isPurchase}

  /** All-days KPI table: one row per event-date present in the input.
    * `day = Some(d)` reproduces the reference's single-day run: when
    * the raw zone is Hive-partitioned (`date=YYYY-MM-DD/hour=HH`, the
    * RawIngest layout), the filter lands on the `date` PARTITION
    * column, so Catalyst prunes the listing to one directory — the
    * Spark restatement of the reference's S3 prefix prune
    * (daily_kpis.py:155-156); only a flat un-partitioned dir falls
    * back to the row filter on the parsed timestamp. Asserted as
    * non-empty `PartitionFilters` in PlanSpec. */
  def compute(spark: SparkSession, rawPath: String, day: Option[String] = None): DataFrame = {
    val rawAll = readRaw(spark, rawPath)
    val partitioned = rawAll.columns.contains("date")
    val raw = rawAll
      // reference drops lines that fail json.loads (daily_kpis.py:104-107);
      // PERMISSIVE mode yields all-null rows w/ corrupt sidecar for those
      .where(col(EventSchema.CorruptCol).isNull)
      .drop(EventSchema.CorruptCol)
      .withColumn("ts", to_timestamp(col("event_ts")))
    val pruned = day.fold(raw) { d =>
      if (partitioned) raw.where(col("date") === lit(d))
      else raw.where(to_date(col("ts")) === lit(d))
    }
    aggregateEvents(pruned.drop("date", "hour"))
  }

  /** The KPI fold itself (daily_kpis.py:109-140) over any DataFrame
    * with (ts, user_id, session_id, event_type, price). Exposed so
    * properties of the fold are testable on arbitrary inputs. */
  def aggregateEvents(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("user_id")).as("unique_users"),
        countDistinct(col("session_id")).as("unique_sessions"),
        sum(when(isPageview(col("event_type")), 1L).otherwise(0L)).as("pageviews"),
        sum(when(isPurchase(col("event_type")), 1L).otherwise(0L)).as("purchases"),
        graft.functions.F.roundBin(sum(when(isPurchase(col("event_type")),
          coalesce(col("price"), lit(0.0))).otherwise(0.0)), 2).as("revenue_usd"))
      .orderBy(col("dt"))

  /** KPI sink (reference: daily_kpis.py:165-172 — snappy parquet under
    * kpis/daily/dt=<day>/). Snappy is Spark's parquet default. */
  def write(kpis: DataFrame, outPath: String): Unit =
    kpis.write.mode("overwrite").partitionBy("dt").parquet(outPath)
}
