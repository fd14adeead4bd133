package graft

import org.apache.spark.sql.functions._
import graft.operators.BucketedJoin

/** Bucketed co-located join: the layout must eliminate the join/agg
  * shuffle entirely (the 100 TB property), while the result stays
  * byte-identical to the plain shuffle join (the oracle semantics).
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed join: no hash-partitioning exchange anywhere in the plan") {
    val df = BucketedJoin.ordersPerKey(spark, sf)
    df.collect() // force AQE to its final plan before inspecting
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"merge hint lost:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed layout must satisfy the join/agg distribution without a shuffle:\n$p")
  }

  test("bucketed join result equals the plain shuffle join") {
    val got = BucketedJoin.ordersPerKey(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val l = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val exp = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        graft.functions.F.roundBin(sum(col("l_quantity")), 2).as("sum_qty"),
        graft.functions.F.roundBin(max(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === exp.length)
    assert(got.toSeq === exp.toSeq)
  }
}
