package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** Bloom-filtered semi join: exactness (identical to the plain semi
  * join — the bloom may only pass false POSITIVES, which the join
  * removes), pruning effectiveness (the pre-filter passes far fewer
  * probe rows than the full probe side), and plan shape (the
  * might_contain filter runs in the probe's scan stage, before any
  * exchange).
  */
class BloomJoinSpec extends SparkSpec {

  test("bloom semi join result equals the plain semi join") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    val urgent = Tables.load(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val got = BloomJoin.semiJoin(li, urgent, "l_orderkey", "o_orderkey", 1024L)
      .orderBy(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .collect().map(_.toSeq)
    val exp = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .orderBy(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .collect().map(_.toSeq)
    assert(got.length === exp.length)
    assert(got.toSeq === exp.toSeq)
  }

  test("bloom pre-filter prunes: superset of matches, strict subset of probe") {
    val li = Tables.load(spark, sf, "lineitem")
    val urgent = Tables.load(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val sketch = BloomJoin.buildSketch(urgent, col("o_orderkey"), 1024L)
    val total = li.count()
    val passed = li.where(BloomJoin.mightContain(sketch, col("l_orderkey"))).count()
    val exact = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(passed >= exact, "bloom must never drop a true match")
    // with ~3% FPP the pass-through should stay close to the exact
    // matches; 2× is generous slack against hash unluckiness
    assert(passed <= math.max(exact * 2, exact + total / 10),
      s"bloom pruned nothing: total=$total passed=$passed exact=$exact")
    assert(passed < total, "pre-filter must prune the probe side")
  }

  test("might_contain filter sits in the probe scan stage, before any exchange") {
    val df = BloomJoin.bloomSemiLineitems(spark, sf)
    df.collect() // settle AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom filter missing from plan:\n$p")
    // the Filter(might_contain) must be BELOW the first exchange on
    // the lineitem branch: in the plan string, the filter line appears
    // after (deeper than) any Exchange line of its stage — assert no
    // Exchange between the parquet scan and the filter by checking the
    // filter is in the same WholeStageCodegen subtree as the scan
    val lines = p.linesIterator.toVector
    val fIdx = lines.indexWhere(_.contains("might_contain"))
    val scanIdx = lines.indexWhere(l => l.contains("Scan parquet") && l.contains("lineitem"), fIdx)
    assert(fIdx >= 0 && scanIdx >= 0, s"plan shape unexpected:\n$p")
    assert(!lines.slice(fIdx, scanIdx).exists(_.contains("Exchange")),
      s"an Exchange sits between the bloom filter and the probe scan — the " +
        s"pruning happens after the shuffle it was meant to avoid:\n$p")
  }

  test("empty build side: null sketch filters everything, join returns empty") {
    // BloomFilterAggregate over zero rows yields a NULL sketch;
    // might_contain(NULL, x) is NULL, so the pre-filter drops every
    // probe row and the semi join is vacuously empty — the same
    // answer as the plain semi join against an empty build side,
    // with no NPE anywhere on the path
    val li = Tables.load(spark, sf, "lineitem")
    val none = Tables.load(spark, sf, "orders")
      .where(col("o_orderkey") < 0).select(col("o_orderkey"))
    val got = graft.operators.BloomJoin
      .semiJoin(li, none, "l_orderkey", "o_orderkey", 1024L)
    assert(got.count() === 0L)
  }

  test("gate query returns the per-flag rollup") {
    val rows = BloomJoin.bloomSemiLineitems(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    assert(rows.forall(_.getLong(1) > 0))
  }
}
