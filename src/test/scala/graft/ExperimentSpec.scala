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

  test("abLift: units partition the user-day population; z recomputes from counts") {
    import org.apache.spark.sql.functions._
    val lift = ExperimentQueries.abLift(spark, sf).head()
    val totalUnits = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().count()
    assert(lift.getAs[Long]("n_a") + lift.getAs[Long]("n_b") == totalUnits,
      "variant unit counts must partition the user-day population")
    // the switchback grain must have genuine variance on this fixture
    // (the user grain degenerates to 100% conversion — that's WHY the
    // unit is user-day)
    assert(lift.getAs[Long]("conv_a") < lift.getAs[Long]("n_a"))
    assert(lift.getAs[Long]("conv_a") > 0L)
    assert(!lift.isNullAt(lift.fieldIndex("z")), "z must be defined here")
    val (na, nb) = (lift.getAs[Long]("n_a").toDouble, lift.getAs[Long]("n_b").toDouble)
    val (ca, cb) = (lift.getAs[Long]("conv_a").toDouble, lift.getAs[Long]("conv_b").toDouble)
    val (ra, rb) = (ca / na, cb / nb)
    val p = (ca + cb) / (na + nb)
    val z = (ra - rb) / math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(lift.getAs[Double]("z") - z) < 1e-5)
    assert(lift.getAs[Boolean]("significant") ==
      (math.abs(z) >= ExperimentQueries.ZCrit))
    assert(math.abs(lift.getAs[Double]("lift_abs") - (ra - rb)) < 1e-5)
  }

  test("cupedLift: closed-form matches a per-user recompute; variance genuinely drops") {
    import org.apache.spark.sql.functions._
    val rows = ExperimentQueries.cupedLift(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("A", "B"))
    // theta is pooled — identical on both rows
    assert(rows("A").getAs[Double]("theta") == rows("B").getAs[Double]("theta"))
    // recompute from raw per-user (x, y, variant)
    val users = Tables.load(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(
        sum(when(to_date(col("ts")) < lit(ExperimentQueries.CupedSplit), 1L)
          .otherwise(0L)).as("x"),
        sum(when(to_date(col("ts")) < lit(ExperimentQueries.CupedSplit), 0L)
          .otherwise(1L)).as("y"))
      .withColumn("variant",
        when(substring(md5(col("user_id").cast("string")), 1, 2) < "80", "A")
          .otherwise("B"))
      .collect().map(r => (r.getAs[String]("variant"),
        r.getAs[Long]("x").toDouble, r.getAs[Long]("y").toDouble))
    val gn = users.length.toDouble
    val gmx = users.map(_._2).sum / gn
    val gmy = users.map(_._3).sum / gn
    val gvarx = users.map(u => (u._2 - gmx) * (u._2 - gmx)).sum / gn
    val gcov = users.map(u => (u._2 - gmx) * (u._3 - gmy)).sum / gn
    val theta = gcov / gvarx
    assert(math.abs(rows("A").getAs[Double]("theta") - theta) < 1e-4)
    Seq("A", "B").foreach { v =>
      val vs = users.filter(_._1 == v)
      val n = vs.length.toDouble
      val my = vs.map(_._3).sum / n
      val varY = vs.map(u => (u._3 - my) * (u._3 - my)).sum / n
      val adj = vs.map(u => u._3 - theta * (u._2 - gmx))
      val mc = adj.sum / n
      val varC = adj.map(a => (a - mc) * (a - mc)).sum / n
      val r = rows(v)
      assert(r.getAs[Long]("n_users") == vs.length)
      assert(math.abs(r.getAs[Double]("mean_y") - my) < 1e-4, v)
      assert(math.abs(r.getAs[Double]("var_y") - varY) < 1e-2, v)
      assert(math.abs(r.getAs[Double]("mean_y_cuped") - mc) < 1e-4, v)
      assert(math.abs(r.getAs[Double]("var_y_cuped") - varC) < 1e-2, v)
    }
    // the provable property is POPULATION-wide: var(Y - theta*X) is
    // minimized at theta = cov/var, so the pooled variance must drop
    // (a 15-user subgroup can legitimately see a pooled theta
    // over-adjust — variant A at sf0.001 does)
    val gvary = users.map(u => (u._3 - gmy) * (u._3 - gmy)).sum / gn
    val adjAll = users.map(u => u._3 - theta * (u._2 - gmx))
    val mcAll = adjAll.sum / gn
    val gvarc = adjAll.map(a => (a - mcAll) * (a - mcAll)).sum / gn
    assert(gvarc < gvary,
      s"CUPED did not reduce pooled variance: $gvarc vs $gvary")
  }

  test("featureAssoc: statistics recompute from the raw contingency table") {
    import org.apache.spark.sql.functions._
    val r = ExperimentQueries.featureAssoc(spark, sf).head()
    val cells = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), hour(col("ts")).as("hr")).count()
      .collect().map(x => (x.getString(0), x.getInt(1)) -> x.getLong(2)).toMap
    val n = cells.values.sum.toDouble
    val xs = cells.keys.map(_._1).toSeq.distinct
    val ys = cells.keys.map(_._2).toSeq.distinct
    val nx = xs.map(x => x -> cells.collect { case ((`x`, _), c) => c }.sum.toDouble).toMap
    val ny = ys.map(y => y -> cells.collect { case ((_, `y`), c) => c }.sum.toDouble).toMap
    val mi = cells.map { case ((x, y), c) =>
      (c / n) * math.log(c * n / (nx(x) * ny(y))) }.sum
    val chi2 = (for { x <- xs; y <- ys } yield {
      val e = nx(x) * ny(y) / n
      val o = cells.getOrElse((x, y), 0L).toDouble
      (o - e) * (o - e) / e
    }).sum
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("dof") == (xs.size - 1) * (ys.size - 1))
    assert(math.abs(r.getAs[Double]("mi") - mi) < 1e-5)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-3)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(r.getAs[Double]("mi") >= 0.0, "MI is non-negative")
  }

  test("ksDrift: reference day scores 0 and KS stays in [0,1]") {
    val rows = ExperimentQueries.ksDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val refDt = rows.map(_.getString(0)).min
    rows.foreach { r =>
      val ks = r.getAs[Double]("ks")
      assert(ks >= 0.0 && ks <= 1.0)
      if (r.getString(0) == refDt) {
        assert(ks == 0.0, s"reference day must self-score 0, got $ks")
        assert(!r.getAs[Boolean]("drift_detected"))
      }
    }
  }

  test("stratifiedSample: exactly ceil(0.1 * n_g) rows per stratum, rank-dense") {
    val rows = ExperimentQueries.stratifiedSample(spark, sf).collect()
    val byStratum = rows.groupBy(_.getString(0))
    byStratum.foreach { case (st, rs) =>
      val nG = rs.head.getAs[Long]("stratum_n")
      assert(rs.forall(_.getAs[Long]("stratum_n") == nG))
      assert(rs.length == math.ceil(nG * 0.1).toLong,
        s"stratum $st: ${rs.length} sampled of $nG")
      assert(rs.map(_.getAs[Long]("sample_rank")).sorted.toSeq ==
        (1L to rs.length).toSeq, "ranks must be 1..k with no gaps")
    }
    // strata cover the full type vocabulary
    val types = Tables.load(spark, sf, "events")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(byStratum.keySet == types)
  }

  test("bernoulliSample: deterministic membership near the 10% target") {
    val a = ExperimentQueries.bernoulliSample(spark, sf).collect()
    val b = ExperimentQueries.bernoulliSample(spark, sf).collect()
    assert(a.map(_.getLong(0)).sorted.toSeq == b.map(_.getLong(0)).sorted.toSeq)
    val total = Tables.load(spark, sf, "events").count()
    val frac = a.length.toDouble / total
    // Binomial(n, .1): sf0.001 has ~6k events, 6 sigma ~ 0.023
    assert(math.abs(frac - 0.09999) < 0.025, s"fraction $frac off target")
  }

  test("woeIv: bins cover the corpus; woe/iv recompute from raw counts") {
    val rows = ExperimentQueries.woeIv(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4))
    val docs = Tables.load(spark, sf, "documents")
      .select("n_chars", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(t => t._2 + t._3).sum == docs.length)
    val pos = docs.count(_._2 == "en").toDouble
    val neg = docs.length - pos
    // independent recompute of every woe and the shared iv
    val expected = rows.map { case (_, np, nn, _, _) =>
      val p = (np + 0.5) / (pos + 2.0); val q = (nn + 0.5) / (neg + 2.0)
      (math.log(p / q), (p - q) * math.log(p / q))
    }
    rows.zip(expected).foreach { case ((b, _, _, woe, _), (w, _)) =>
      assert(math.abs(woe - math.rint(w * 1e6) / 1e6) < 1e-9, s"bin $b woe")
    }
    val iv = expected.map(_._2).sum
    rows.foreach { case (_, _, _, _, got) =>
      assert(math.abs(got - math.rint(iv * 1e6) / 1e6) < 1e-9)
    }
    // discriminative on this corpus: en docs skew long by construction,
    // so IV must be positive (a zero IV would mean the bins say nothing)
    assert(iv > 0.0)
  }
}
