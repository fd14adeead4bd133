package graft

import graft.operators.TpchQueries

/** Join / window / set-op surface (SURVEY.md §2.4–2.7) checked against
  * plain-Scala recomputation on collected fixture rows (sf0.001 is
  * small enough to fold on the driver).
  */
class TpchQueriesSpec extends SparkSpec {

  private lazy val orders: Seq[(Long, Long, Double, String)] =
    Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))

  private lazy val custkeys: Set[Long] =
    Tables.load(spark, sf, "customer").select("c_custkey")
      .collect().map(_.getLong(0)).toSet

  test("q1 pricing summary: counts partition lineitem rows under the filter") {
    val li = Tables.load(spark, sf, "lineitem")
    val expected = li.where("l_shipdate <= timestamp'1998-09-02'").count()
    val rows = TpchQueries.q1PricingSummary(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("count_order")).sum === expected)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length === rows.length)
  }

  test("topkOrders = driver-side sort take 10") {
    val exp = orders.sortBy(o => (-o._3, o._1)).take(10).map(_._1)
    val got = TpchQueries.topkOrders(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(got === exp)
  }

  test("joinSemi = customers with >=1 urgent order") {
    val exp = orders.filter(_._4 == "1-URGENT").map(_._2).toSet.intersect(custkeys)
    val got = TpchQueries.joinSemi(spark, sf).collect().map(_.getLong(0)).toSet
    assert(got === exp)
  }

  test("joinAnti = customers minus customers-with-orders") {
    val exp = custkeys -- orders.map(_._2).toSet
    val got = TpchQueries.joinAnti(spark, sf).collect().map(_.getLong(0)).toSet
    assert(got === exp)
  }

  test("joinOuterCounts keeps every customer and sums to total orders on cust keys") {
    val rows = TpchQueries.joinOuterCounts(spark, sf).collect()
    assert(rows.length === custkeys.size)
    val expOrders = orders.count(o => custkeys(o._2))
    assert(rows.map(_.getAs[Long]("n_orders")).sum === expOrders)
  }

  test("windowTopPerCustomer: <=3 per customer, descending within customer") {
    val rows = TpchQueries.windowTopPerCustomer(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (ck, grp) =>
      assert(grp.length <= 3, s"customer $ck has ${grp.length} rows")
      val sorted = grp.sortBy(_._4)
      assert(sorted.map(_._3).zip(sorted.tail.map(_._3)).forall { case (a, b) => a >= b })
      val exp = orders.filter(_._2 == ck).sortBy(o => (-o._3, o._1)).take(grp.length).map(_._1)
      assert(sorted.map(_._2).toSeq === exp)
    }
  }

  test("setOps: intersect ⊆ union, except ∩ intersect = ∅") {
    val rows = TpchQueries.setOps(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val u = rows.filter(_._2 == "union").map(_._1).toSet
    val i = rows.filter(_._2 == "intersect").map(_._1).toSet
    val e = rows.filter(_._2 == "except").map(_._1).toSet
    assert(i.subsetOf(u) && e.subsetOf(u) && (i & e).isEmpty)
    val withOrders = orders.map(_._2).toSet
    assert(i === (i & withOrders))
    assert((e & withOrders).isEmpty)
  }

  test("aboveAvgOrders: every row beats 1.5x its customer's average") {
    val avgByCust = orders.groupBy(_._2).map { case (k, v) =>
      k -> v.map(_._3).sum / v.size
    }
    val got = TpchQueries.aboveAvgOrders(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expCount = orders.count(o => o._3 > avgByCust(o._2) * 1.5)
    assert(got.length === expCount)
    got.foreach { case (_, ck, price) =>
      assert(price > avgByCust(ck) * 1.5 - 0.01)
    }
  }

  test("q10ReturnedItems: top-20 matches a driver-side recompute") {
    val li = Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
    val ord = Tables.load(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_custkey", "cast(o_orderdate as date) as od")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toString))
    val inWindow = ord.filter(o => o._3 >= "1996-01-01" && o._3 < "1996-07-01")
      .map(o => o._1 -> o._2).toMap
    val revByCust = li
      .filter(l => l._4 == "R" && inWindow.contains(l._1))
      .groupBy(l => inWindow(l._1))
      .view.mapValues(ls => ls.map(l => l._2 * (1 - l._3)).sum).toMap
    val expected = revByCust.toSeq
      .map { case (ck, rev) => (ck, BigDecimal(rev).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (ck, rev) => (-rev, ck) }.take(20)
    val got = TpchQueries.q10ReturnedItems(spark, sf).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Double]("revenue")))
    assert(got.length === expected.length)
    got.zip(expected).foreach { case ((gck, grev), (eck, erev)) =>
      assert(gck === eck)
      assert(math.abs(grev - erev) < 0.011)
    }
  }
}
