package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineQueries

/** Driver-side equivalence checks for the pipeline gate queries that
  * round-trip fixture data through a serialized zone (CSV scan,
  * stream-stream join): each must equal the same computation run
  * directly over the parquet fixture.
  */
class PipelineQueriesSpec extends SparkSpec {

  test("csvScan equals direct aggregation over the parquet fixture") {
    val got = PipelineQueries.csvScan(spark, sf).collect()
    val exp = Tables.load(spark, sf, "events")
      .groupBy(coalesce(col("event_type"), lit("")).as("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        graft.functions.F.roundBin(sum(coalesce(col("value"), lit(0.0))), 2).as("total_value"))
      .orderBy(col("event_type")).collect()
    assert(got.map(_.toSeq).toSeq === exp.map(_.toSeq).toSeq)
  }

  test("streamJoin equals the batch event-time interval join") {
    val got = PipelineQueries.streamJoin(spark, sf).collect()
    // batch recompute with the same second-truncated timestamps the
    // wire feed carries
    val e = Tables.load(spark, sf, "events")
      .where(to_date(col("ts")) < lit(PipelineQueries.JoinCutoff))
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts"),
        lower(coalesce(col("event_type"), lit(""))).as("et"))
    val p = e.where(col("et") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val v = e.where(col("et").isin("view", "click"))
      .select(col("user_id").as("vu"), col("ts").as("vts"))
    val exp = p.join(v, col("pu") === col("vu") &&
        col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("vts") <= col("pts"))
      .groupBy(date_format(col("pts"), "yyyy-MM-dd").as("dt"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("pu")).as("n_buyers"))
      .orderBy(col("dt")).collect()
    assert(got.map(_.toSeq).toSeq === exp.map(_.toSeq).toSeq)
  }

  test("streamJoinOuter: watermark-released outer rows equal the batch left join") {
    val got = PipelineQueries.streamJoinOuter(spark, sf).collect()
    val lastFullDay = java.time.LocalDate.parse(PipelineQueries.JoinCutoff)
      .minusDays(1).toString
    val e = Tables.load(spark, sf, "events")
      .where(to_date(col("ts")) < lit(PipelineQueries.JoinCutoff))
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts"),
        lower(coalesce(col("event_type"), lit(""))).as("et"))
    val p = e.where(col("et") === "purchase" && to_date(col("ts")) < lit(lastFullDay))
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val v = e.where(col("et").isin("view", "click"))
      .select(col("user_id").as("vu"), col("ts").as("vts"))
    val exp = p.join(v, col("pu") === col("vu") &&
        col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("vts") <= col("pts"), "left_outer")
      .groupBy(date_format(col("pts"), "yyyy-MM-dd HH:00").as("hour"))
      .agg(count(col("vts")).as("n_pairs"),
        sum(when(col("vts").isNull, 1).otherwise(0)).cast("long").as("n_unmatched"),
        countDistinct(col("pu")).as("n_buyers"))
      .orderBy(col("hour")).collect()
    assert(got.map(_.toSeq).toSeq === exp.map(_.toSeq).toSeq)
    // the outer semantics actually fired: at least one unmatched purchase
    assert(got.map(_.getAs[Long]("n_unmatched")).sum > 0)
  }

  test("dppScan: runtime partition pruning fires and equals direct aggregation") {
    val df = PipelineQueries.dppScan(spark, sf)
    val got = df.collect()
    val exp = Tables.load(spark, sf, "events")
      .where(to_date(col("ts")) < lit(PipelineQueries.StreamCutoff)
        && dayofmonth(to_date(col("ts"))) % 2 === 1)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.F.roundBin(sum(coalesce(col("value"), lit(0.0))), 2)
          .as("revenue"))
      .orderBy(col("date")).collect()
    // the zone's `date` partition column is directory-inferred as DATE;
    // compare at string level like the oracle does
    assert(got.map(_.toSeq.map(String.valueOf)).toSeq
      === exp.map(_.toSeq.map(String.valueOf)).toSeq)
    // the partition filter is DYNAMIC: planted at planning, resolved at
    // runtime from the broadcast build side
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"), s"no dynamic pruning in plan:\n$plan")
  }

  test("orcScan equals the parquet computation and pushes the filter into ORC") {
    val got = PipelineQueries.orcScan(spark, sf)
    val exp = Tables.load(spark, sf, "lineitem")
      .where(col("l_shipdate") >= lit("1997-07-01").cast("timestamp"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        graft.functions.F.roundBin(sum(col("l_quantity")), 2).as("sum_qty"),
        graft.functions.F.roundBin(
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("l_returnflag")).collect()
    assert(got.collect().map(_.toSeq).toSeq === exp.map(_.toSeq).toSeq)
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("Format: ORC") || p.contains("orc"), s"not an ORC scan:\n$p")
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate bound not pushed into the ORC scan:\n$p")
  }
}
