package graft

import graft.operators.TpchQueries

/** Round-6 relational additions: GROUPING SETS, forward/backward fill,
  * snapshot diff. Each is recomputed driver-side from the fixture so
  * the spec is independent of the DuckDB oracle path.
  */
class RelationalExtrasSpec extends SparkSpec {

  private lazy val orders: Seq[(Long, String, String, Double)] =
    Tables.load(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))

  test("groupingSets: three slices partition the table, flags disambiguate") {
    val rows = TpchQueries.groupingSetsOrders(spark, sf).collect()
    val statusRows = rows.filter(r =>
      r.getAs[Int]("g_status") == 0 && r.getAs[Int]("g_priority") == 1)
    val prioRows = rows.filter(r =>
      r.getAs[Int]("g_status") == 1 && r.getAs[Int]("g_priority") == 0)
    val totalRows = rows.filter(r =>
      r.getAs[Int]("g_status") == 1 && r.getAs[Int]("g_priority") == 1)
    // exactly the three declared sets, nothing else (no (0,0) rows)
    assert(statusRows.length + prioRows.length + totalRows.length === rows.length)
    assert(totalRows.length === 1)
    assert(totalRows.head.getAs[Long]("n_orders") === orders.size)
    // each slice re-partitions the full table
    assert(statusRows.map(_.getAs[Long]("n_orders")).sum === orders.size)
    assert(prioRows.map(_.getAs[Long]("n_orders")).sum === orders.size)
    // per-status counts match a driver-side groupBy
    val expStatus = orders.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    statusRows.foreach { r =>
      assert(r.getAs[Long]("n_orders") === expStatus(r.getString(0)))
      assert(r.isNullAt(r.fieldIndex("o_orderpriority")),
        "aggregated-away key must be NULL in the status slice")
    }
  }

  test("forwardFill matches a driver-side carry-forward/backward walk") {
    val got = TpchQueries.forwardFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2, t._3))
    val li = Tables.load(spark, sf, "lineitem")
      .where("l_shipdate >= timestamp'1998-01-01'")
      .selectExpr("l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), ()))
    val exp = li.groupBy(_._1).toSeq.flatMap { case (ok, rows) =>
      val sorted = rows.sortBy(t => (t._2, t._3))
      val gappy = sorted.map { case (_, ln, price, _) =>
        if (ln % 3 == 1) None
        else Some(graft.functions.Sketches.roundBin(price, 2))
      }
      // forward carry, then backward carry for the leading-null prefix
      val ffill = gappy.scanLeft(Option.empty[Double])((acc, v) => v.orElse(acc)).tail
      val bfill = gappy.scanRight(Option.empty[Double])((v, acc) => v.orElse(acc)).init
      sorted.lazyZip(gappy).lazyZip(ffill).lazyZip(bfill).map {
        case ((_, ln, _, _), g, f, b) => (ok, ln, g, f, f.orElse(b))
      }
    }.sortBy(t => (t._1, t._2, t._3))
    assert(got.length === exp.length)
    got.zip(exp).foreach { case (g, e) => assert(g === e) }
    // the synthesized gaps actually exercise both directions
    assert(exp.exists(t => t._3.isEmpty && t._4.isDefined), "mid-gap ffill")
    assert(exp.exists(t => t._4.isEmpty && t._5.isDefined), "leading-null bfill")
  }

  test("snapshotDiff classes match a driver-side diff of the two snapshots") {
    def r2(x: Double): Double = graft.functions.Sketches.roundBin(x, 2)
    val a = orders.collect { case (k, _, _, p) if k % 5 != 0 => k -> r2(p) }.toMap
    val b = orders.collect { case (k, _, _, p) if k % 7 != 0 =>
      k -> r2(if (k % 3 == 0) p * 1.1 else p)
    }.toMap
    val exp = (a.keySet ++ b.keySet).groupBy { k =>
      if (!a.contains(k)) "insert"
      else if (!b.contains(k)) "delete"
      else if (a(k) != b(k)) "update"
      else "unchanged"
    }.map { case (c, ks) => c -> (ks.size.toLong, ks.min, ks.max) }
    val got = TpchQueries.snapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getLong(2), r.getLong(3))).toMap
    assert(got === exp)
    assert(got.keySet === Set("insert", "delete", "update", "unchanged"),
      "all four CDC classes must be populated")
  }

  test("joinCardinalityEst tracks the true join size (key-correlated sampling)") {
    import org.apache.spark.sql.functions.col
    val r = TpchQueries.joinCardinalityEstRaw(spark, sf).collect().head
    val est = r.getAs[Long]("est_join_rows")
    val estKeys = r.getAs[Long]("est_join_keys")
    val li = Tables.load(spark, sf, "lineitem").select(col("l_orderkey"))
    val ord = Tables.load(spark, sf, "orders").select(col("o_orderkey"))
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val exact = joined.count()
    val exactKeys = joined.select(col("l_orderkey")).distinct().count()
    assert(r.getAs[Long]("sample_pairs") > 0, "sample must be non-empty")
    // key-level sampling at p=1/16: per-key contribution is exact, so
    // the deviation is purely which keys the fixed hash keeps. The
    // sf0.001 sample holds ~95 keys; 3.5σ of the key-count binomial is
    // ~35% — deterministic (seeded hash), so this is a fixed gate, not
    // a flaky one.
    assert(math.abs(est - exact) <= 0.35 * exact, s"rows: est=$est exact=$exact")
    assert(math.abs(estKeys - exactKeys) <= 0.35 * exactKeys,
      s"keys: est=$estKeys exact=$exactKeys")
  }
}
