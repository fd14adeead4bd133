package graft

import graft.operators.ExperimentQueries

/** Properties of the drift / experimentation operators that the
  * DuckDB hash oracle can't express: PSI's mathematical invariants
  * and the determinism + partition laws of the hash assignment.
  */
class ExperimentSpec extends SparkSpec {

  test("driftPsi: reference day scores exactly 0 and PSI is non-negative") {
    val rows = ExperimentQueries.driftPsi(spark, sf).collect()
    assert(rows.nonEmpty)
    val refDt = rows.map(_.getString(0)).min
    rows.foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(psi >= 0.0, s"PSI must be >= 0, got $psi on ${r.getString(0)}")
      if (r.getString(0) == refDt)
        assert(psi == 0.0, s"reference day must self-score 0, got $psi")
    }
  }

  test("driftPsi: day count and event totals match an independent aggregation") {
    import org.apache.spark.sql.functions._
    val rows = ExperimentQueries.driftPsi(spark, sf).collect()
    val expect = Tables.load(spark, sf, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") == expect(r.getString(0)))
    }
  }

  test("abSrm: variants partition the user population; chi2 consistent") {
    import org.apache.spark.sql.functions._
    val rows = ExperimentQueries.abSrm(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("A", "B"))
    val totalUsers = rows.map(_.getAs[Long]("n_users")).sum
    val distinctUsers = Tables.load(spark, sf, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(totalUsers == distinctUsers,
      "variant user counts must partition the distinct-user population")
    // chi2 recomputed from the reported counts must match the query's
    val exp = totalUsers.toDouble / 2
    val chi2 = rows.map(r => math.pow(r.getAs[Long]("n_users") - exp, 2) / exp).sum
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("srm_chi2") - chi2) < 1e-4)
      assert(r.getAs[Boolean]("srm_detected") == chi2 >= ExperimentQueries.SrmChi2Crit)
    }
    // the tiny fixture's 3-vs-12 split is a genuine mismatch — the
    // gate must actually fire, not just exist
    assert(rows.head.getAs[Boolean]("srm_detected"))
  }

  test("abSrm: assignment is a pure function of user_id (stable across runs)") {
    val a = ExperimentQueries.abSrm(spark, sf).collect()
    val b = ExperimentQueries.abSrm(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
