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
