package graft

import graft.operators.TpchDeep
import java.sql.Timestamp

/** Subquery-family queries (TpchDeep) checked against plain-Scala
  * recomputation of the ORIGINAL correlated-subquery semantics on
  * collected sf0.001 rows — in particular Q21, where the Spark plan is
  * an aggregation rewrite of a double-correlated EXISTS/NOT EXISTS and
  * the equivalence is the thing to prove.
  */
class TpchDeepSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  import org.apache.spark.sql.functions.col

  private lazy val lineitem: Seq[(Long, Long, Timestamp, Double)] =
    Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate").cast("timestamp"), col("l_quantity"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))

  private lazy val orders: Seq[(Long, Long, Timestamp, String, String)] =
    Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").cast("timestamp"),
        col("o_orderstatus"), col("o_orderpriority"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3), r.getString(4)))

  private def plusDays(t: Timestamp, d: Int): Timestamp =
    new Timestamp(t.getTime + d * 86400000L)

  test("q4: EXISTS semi-join = per-order driver recompute of lateness") {
    val lateOrders = lineitem.groupBy(_._1)
    val exp = orders.filter { case (ok, _, od, _, _) =>
      od.compareTo(ts("1996-01-01")) >= 0 && od.compareTo(ts("1996-04-01")) < 0 &&
        lateOrders.getOrElse(ok, Nil).exists(_._3.after(plusDays(od, 30)))
    }.groupBy(_._5).view.mapValues(_.size.toLong).toMap
    val got = TpchDeep.q4PriorityExists(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exp)
  }

  test("q13: distribution accounts for every customer incl. zero-order bucket") {
    val rows = TpchDeep.q13Custdist(spark, sf).collect()
    val nCust = Tables.load(spark, sf, "customer").count()
    assert(rows.map(_.getAs[Long]("custdist")).sum === nCust)
    val countedOrders = orders.count(_._5 != "4-NOT SPECIFIED")
    assert(rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
      === countedOrders)
  }

  test("q15: returned supplier(s) carry the max quarterly revenue") {
    val rows = TpchDeep.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length === 1)
  }

  test("q17: decorrelated avg-subquery = driver recompute") {
    val partKeys = Tables.load(spark, sf, "part")
      .where("p_brand = 'Brand#4' AND p_size < 15")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val liPQ = Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .filter(t => partKeys(t._1))
    val halfAvg = liPQ.groupBy(_._1).view
      .mapValues(ls => 0.5 * ls.map(_._2).sum / ls.size).toMap
    val exp = math.rint(liPQ.filter(t => t._2 < halfAvg(t._1)).map(_._3).sum / 7.0 * 100) / 100
    val got = TpchDeep.q17SmallQtyRevenue(spark, sf).collect()(0).getAs[Double]("avg_yearly")
    assert(math.abs(got - exp) < 0.011)
  }

  test("q18: every order exceeds the quantity threshold, ordering total") {
    val rows = TpchDeep.q18LargeOrders(spark, sf).collect()
    assert(rows.forall(_.getAs[Double]("sum_qty") > 300))
    val key = rows.map(r => (-r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
    assert(key.sameElements(key.sorted))
  }

  test("q21: aggregation rewrite = literal EXISTS/NOT-EXISTS fold") {
    // Literal semantics: count lineitems l1 of F-orders shipped >60d
    // late where another supplier appears in the order and NO other
    // supplier is also late.
    val ordF = orders.filter(_._4 == "F").map(o => o._1 -> o._3).toMap
    val byOrder = lineitem.filter(l => ordF.contains(l._1)).groupBy(_._1)
    val exp = byOrder.toSeq.flatMap { case (ok, ls) =>
      val cut = plusDays(ordF(ok), 60)
      val lateSupps = ls.filter(_._3.after(cut)).map(_._2).distinct
      val allSupps = ls.map(_._2).distinct
      if (allSupps.size >= 2 && lateSupps.size == 1)
        ls.filter(l => l._3.after(cut) && l._2 == lateSupps.head).map(_ => lateSupps.head)
      else Nil
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sup = Tables.load(spark, sf, "supplier")
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expByName = exp.toSeq.map { case (sk, n) => sup(sk) -> n }
      .sortBy { case (name, n) => (-n, name) }.take(100).toMap
    val got = TpchDeep.q21WaitingSuppliers(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expByName)
  }

  test("q2: each part's row carries the true min cost among its EU suppliers") {
    val rows = TpchDeep.q2MinCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    // one row per part, and parts are distinct
    val parts = rows.map(_.getAs[Long]("p_partkey"))
    assert(parts.distinct.length === parts.length)
    // ordering: rounded acctbal desc with name/partkey tiebreak
    val key = rows.map(r => (-r.getAs[Double]("s_acctbal"),
      r.getAs[String]("s_name"), r.getAs[Long]("p_partkey")))
    assert(key.sameElements(key.sorted))
  }

  test("q11: every kept part exceeds 3x the average per-part value") {
    val rows = TpchDeep.q11ImportantStock(spark, sf).collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getAs[Double]("value"))
    assert(vals.sameElements(vals.sorted.reverse))
  }

  test("q20: shippers recompute (driver fold over blue-part 1996 quantities)") {
    val blue = Tables.load(spark, sf, "part")
      .where("p_name LIKE '%blue%'").select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val liRows = Tables.load(spark, sf, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_partkey"),
        org.apache.spark.sql.functions.col("l_suppkey"),
        org.apache.spark.sql.functions.col("l_shipdate").cast("timestamp"),
        org.apache.spark.sql.functions.col("l_quantity"))
      .collect()
      .filter { r =>
        val t = r.getTimestamp(2)
        blue(r.getLong(0)) && !t.before(ts("1996-01-01")) && t.before(ts("1997-01-01"))
      }
    val qualified = liRows.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getDouble(3)).sum).filter(_._2 > 100).keySet
    val n4 = Tables.load(spark, sf, "supplier")
      .join(Tables.load(spark, sf, "nation")
        .where("n_name = 'NATION_4'"),
        org.apache.spark.sql.functions.col("s_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val got = TpchDeep.q20PartShippers(spark, sf).collect().map(_.getLong(0)).toSet
    assert(got === n4.intersect(qualified))
  }

  test("q22: idle = above positive-average balance with no recent order") {
    val rows = TpchDeep.q22IdleCustomers(spark, sf).collect()
    val cust = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val posAvg = { val p = cust.filter(_._2 > 0); p.map(_._2).sum / p.length }
    val recent = orders.filter(_._3.compareTo(ts("2000-01-01")) >= 0).map(_._2).toSet
    val expCnt = cust.filter(c => (c._1 % 7) < 4 && c._2 > posAvg && !recent(c._1))
      .groupBy(c => (c._1 % 7).toInt).view.mapValues(_.length.toLong).toMap
    val gotCnt = rows.map(r => r.getInt(0) -> r.getAs[Long]("numcust")).toMap
    assert(gotCnt === expCnt)
  }
}
