package graft

import org.apache.spark.sql.functions._

/** Raw-SQL entry point: Tables.registerViews + GraftFunctions lets a
  * user drive the engine with query TEXT only — no Scala API. Asserts
  * a TPC-H-shape SQL query matches its DataFrame twin, that the
  * events-ts normalization applies through the view, and that graft's
  * custom functions resolve inside plain SQL. */
class SqlInterfaceSpec extends SparkSpec {

  test("TPC-H Q6 shape via pure SQL text equals the DataFrame result") {
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      """SELECT round_bin(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |""".stripMargin).collect()(0).getDouble(0)
    val viaDf = Tables.load(spark, sf, "lineitem")
      .where(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(graft.functions.F.roundBin(
        sum(col("l_extendedprice") * col("l_discount")), 2))
      .collect()(0).getDouble(0)
    assert(viaSql == viaDf)
  }

  test("events view carries the normalized TimestampType ts") {
    Tables.registerViews(spark, sf)
    val dt = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType
    assert(dt == org.apache.spark.sql.types.TimestampType, dt)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  test("custom aggregate + scalar functions compose in SQL over a view") {
    // KMV: no name collision with Spark's datasketches builtins (the
    // builtin `hll_union` shadows graft's SQL name — install() never
    // overrides a builtin; Scala callers use F.hllUnion directly)
    Tables.registerViews(spark, sf)
    val est = spark.sql(
      """SELECT kmv_estimate(kmv_union(sk)) AS users FROM (
        |  SELECT kmv_sketch(user_id) AS sk FROM events
        |  GROUP BY date_format(ts, 'yyyy-MM-dd'))""".stripMargin)
      .collect()(0).getLong(0)
    val exact = Tables.load(spark, sf, "events")
      .agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    // KMV is exact below capacity (k=1024 > fixture user count)
    assert(est == exact, s"$est vs $exact")
  }
}
