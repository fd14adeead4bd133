package graft

import graft.operators.ClickstreamGraph
import org.apache.spark.sql.functions._

/** Invariant + plan tests for the clickstream graph/behavior wave.
  * Value-level exactness is the DuckDB oracle gate's job; these pin
  * the mathematical invariants and the physical plans that make each
  * operator scale-safe.
  */
class ClickstreamGraphSpec extends SparkSpec {

  test("pagerank: probability-like mass and positivity") {
    val rows = ClickstreamGraph.pagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    val prs = rows.map(_.getDouble(1))
    val n = prs.length
    // every node keeps at least the teleport mass (1-d)/n
    assert(prs.forall(_ >= (1.0 - 0.85) / n - 1e-9))
    // simplified formulation: dangling mass leaks, so total <= 1
    assert(prs.sum <= 1.0 + 1e-6, s"pr mass ${prs.sum}")
    assert(prs.sum >= 0.5, s"pr mass ${prs.sum} suspiciously low")
  }

  test("pagerank: fixpoint iterations run on the aggregated graph via broadcast joins") {
    val plan = ClickstreamGraph.pagerank(spark, sf)
      .queryExecution.executedPlan.toString
    // rank-vector x edge-list joins must broadcast (vocab-sized sides);
    // a shuffled join in the unrolled loop would mean the iteration is
    // keyed on raw-data grain
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"), "iteration joins must not sort-merge")
  }

  test("bounceRate: bounces bounded by sessions; session total matches sessionize") {
    val br = ClickstreamGraph.bounceRate(spark, sf).collect()
    assert(br.nonEmpty)
    br.foreach { r =>
      val (n, b, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(b <= n)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    val totalSessions = br.map(_.getLong(1)).sum
    val viaSessionize = graft.operators.KpiQueries.sessionize(spark, sf)
      .agg(sum(col("n_sessions"))).collect()(0).getLong(0)
    assert(totalSessions == viaSessionize,
      s"entry-grain rollup $totalSessions != sessionize $viaSessionize")
  }

  test("dwellTime: dwell averages sit inside the session gap window") {
    val rows = ClickstreamGraph.dwellTime(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getDouble(2)
      assert(avg >= 0.0 && avg <= 1800.0, s"${r.getString(0)}: $avg")
    }
  }

  test("triangleAudit: degree-ordered count equals brute force; transitivity recomputes") {
    val row = ClickstreamGraph.triangleAudit(spark, sf).collect().head
    val edges = graft.operators.TextQueries.ngramJaccard(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val eset = edges.toSet
    // brute force: every id triple that pairwise-connects
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      if eset((ids(i), ids(j)))
      k <- (j + 1) until ids.length
      if eset((ids(i), ids(k))) && eset((ids(j), ids(k)))
    } yield 1).size.toLong
    assert(row.getAs[Long]("n_edges") == edges.length.toLong)
    assert(row.getAs[Long]("n_triangles") == brute,
      s"degree-ordered count ${row.getAs[Long]("n_triangles")} != brute $brute")
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map(_._2.length.toLong)
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    assert(row.getAs[Long]("n_wedges") == wedges)
    val expected =
      if (wedges > 0) math.rint(brute * 3.0 / wedges * 1e6) / 1e6 else 0.0
    assert(math.abs(row.getAs[Double]("transitivity") - expected) < 1e-9)
  }

  test("cooccurrence: pair counts bounded by marginals; driver recompute of one pair") {
    val rows = ClickstreamGraph.cooccurrence(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (both, na, nb, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(both <= math.min(na, nb))
      assert(lift > 0.0)
    }
    // independent recompute of the first pair straight from the fixture
    val r0 = rows.head
    val (a, b) = (r0.getString(0), r0.getString(1))
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), lower(coalesce(col("event_type"), lit(""))).as("et"))
    val expected = ev.where(col("et") === a).select("user_id").distinct()
      .intersect(ev.where(col("et") === b).select("user_id").distinct())
      .count()
    assert(r0.getLong(2) == expected, s"($a,$b): ${r0.getLong(2)} != $expected")
  }
}
