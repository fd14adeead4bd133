package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Deep TPC-H-derived query shapes — the subquery/decorrelation
  * family (EXISTS, NOT EXISTS, correlated scalar aggregates, HAVING
  * pushup, disjunctive pushdown) the simpler star queries in
  * [[TpchQueries]] don't exercise. The fixtures are a trimmed TPC-H
  * (no partsupp, no commit/receipt dates, no phone/container), so
  * each query keeps the REFERENCE SHAPE of its TPC-H number while
  * substituting available columns; the point is the PLAN:
  *
  *  - Q4/Q21/Q22-style EXISTS / NOT EXISTS become left-semi /
  *    left-anti joins (never a row-at-a-time subquery per tuple);
  *  - Q17-style correlated scalar aggregates decorrelate to a
  *    pre-aggregated build side broadcast back onto the fact scan;
  *  - Q21's double-correlated EXISTS + NOT EXISTS collapses into ONE
  *    per-order aggregation (count-distinct suppliers / late
  *    suppliers) — one shuffle where the literal translation would
  *    re-scan lineitem three times;
  *  - Q13's LEFT OUTER + COUNT survives as a two-level aggregation
  *    with the right-side filter pushed below the join.
  *
  * At 100 TB: every build side here is either a dimension (broadcast)
  * or a pre-aggregated per-key table orders of magnitude smaller than
  * the fact; the only fact-fact shuffles are on l_orderkey, the
  * natural co-partition key shared by every query in the family.
  */
object TpchDeep {
  import graft.Tables.load

  private val day30 = expr("INTERVAL 30 DAYS")
  private val day60 = expr("INTERVAL 60 DAYS")

  /** Q4-shape: order-priority count where EXISTS a line shipped >30
    * days after the order date. Left-semi join on the co-partition
    * key carries the non-equi lateness predicate. */
  def q4PriorityExists(spark: SparkSession, dir: String): DataFrame = {
    val ord = load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val li = load(spark, dir, "lineitem")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate") + day30,
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q7-shape volume shipping between two nations: one fact-fact
    * shuffle (lineitem ⋈ orders), every dimension broadcast, the
    * nation-pair disjunction applied after both nation lookups. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val ord = load(spark, dir, "orders")
    val sup = load(spark, dir, "supplier")
    val cust = load(spark, dir, "customer")
    val n1 = load(spark, dir, "nation").select(
      col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = load(spark, dir, "nation").select(
      col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(F.roundBin(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8-shape market share: NATION_2 suppliers' share of PROMO-part
    * revenue sold into ASIA customers, by order year. The CASE-inside-
    * ratio aggregates in one pass (no second scan for the numerator). */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part").where(col("p_type") === "PROMO")
    val li = load(spark, dir, "lineitem")
    val ord = load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val cust = load(spark, dir, "customer")
    val sup = load(spark, dir, "supplier")
    val cNation = load(spark, dir, "nation").select(
      col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val sNation = load(spark, dir, "nation").select(
      col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val region = load(spark, dir, "region").where(col("r_name") === "ASIA")
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cNation), col("c_nationkey") === col("c_nk"))
      .join(broadcast(region), col("c_rk") === col("r_regionkey"))
      .join(broadcast(sNation), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(F.roundBin(
        sum(when(col("supp_nation") === "NATION_2", vol).otherwise(lit(0.0)))
          / sum(vol), 4).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q9-shape product profit by supplier nation and year. No partsupp
    * in the fixture, so cost is proxied by 0.4·p_retailprice·quantity;
    * the shape — LIKE-filtered part broadcast pruning the fact scan,
    * profit expression aggregated by (nation, year) — is Q9's. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part").where(col("p_name").contains("gear"))
    val li = load(spark, dir, "lineitem")
    val ord = load(spark, dir, "orders")
    val sup = load(spark, dir, "supplier")
    val nation = load(spark, dir, "nation")
    // The profit term subtracts two same-magnitude products, amplifying
    // FP summation-order drift past the 2dp gate; quantize each row to
    // an exact DECIMAL(20,4) so both engines sum identical values with
    // exact arithmetic (order-independent), then round the exact total.
    val profit = (col("l_extendedprice") * (lit(1) - col("l_discount")) -
      lit(0.4) * col("p_retailprice") * col("l_quantity")).cast("decimal(20,4)")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(F.roundBin(sum(profit).cast("double"), 2).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q13-shape customer order-count distribution: right side filtered
    * BELOW the left-outer join, then two stacked aggregations. The
    * outer join preserves zero-order customers (c_count = 0 bucket). */
  def q13Custdist(spark: SparkSession, dir: String): DataFrame = {
    val cust = load(spark, dir, "customer")
    val ord = load(spark, dir, "orders")
      .where(col("o_orderpriority") =!= "4-NOT SPECIFIED")
    val perCust = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15-shape top supplier: quarterly revenue per supplier equal to
    * the global max. The scalar MAX is a broadcast 1-row join, not a
    * window over a single partition. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val rev = li.groupBy(col("l_suppkey"))
      .agg(F.roundBin(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    val sup = load(spark, dir, "supplier")
    rev.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q16-shape supplier count per (brand, type, size): NOT IN becomes
    * a broadcast left-anti join on the (tiny) excluded-supplier set;
    * distinct-supplier count is the only shuffle. */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part")
      .where(col("p_brand") =!= "Brand#4"
        && col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    val badSupp = load(spark, dir, "supplier").where(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val li = load(spark, dir, "lineitem")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q17-shape small-quantity revenue: the correlated
    * `avg(l_quantity) per part` subquery decorrelates into a per-part
    * aggregate (computed only over qualifying parts via a semi filter)
    * broadcast back onto the fact scan. Single-row output. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part")
      .where(col("p_brand") === "Brand#4" && col("p_size") < 15)
      .select(col("p_partkey"))
    val li = load(spark, dir, "lineitem")
    val scoped = li.join(broadcast(part), col("l_partkey") === col("p_partkey"), "left_semi")
    val avgQty = scoped.groupBy(col("l_partkey").as("pk"))
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg_qty"))
    scoped.join(broadcast(avgQty), col("l_partkey") === col("pk"))
      .where(col("l_quantity") < col("half_avg_qty"))
      .agg(F.roundBin(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** Q18-shape large-volume customers: HAVING on a pre-aggregated
    * per-order quantity (map-side-combined) joined back to orders on
    * the co-partition key, dims broadcast, top-100 via
    * TakeOrderedAndProject. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .where(col("sum_qty") > 300)
    val ord = load(spark, dir, "orders")
    val cust = load(spark, dir, "customer")
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        F.roundBin(col("o_totalprice"), 2).as("o_totalprice"),
        F.roundBin(col("sum_qty"), 2).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q19-shape disjunctive revenue: three brand/size/quantity
    * conjunctions OR'd. The common `p_partkey = l_partkey` equi-key
    * keeps this a broadcast hash join (never a cartesian); the
    * disjunction evaluates post-join inside codegen. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part")
    val li = load(spark, dir, "lineitem")
    val c1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
      col("l_quantity").between(1, 20)
    val c2 = col("p_brand") === "Brand#2" && col("p_size").between(5, 20) &&
      col("l_quantity").between(10, 30)
    val c3 = col("p_brand") === "Brand#3" && col("p_size").between(10, 40) &&
      col("l_quantity").between(20, 40)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .where(c1 || c2 || c3)
      .agg(F.roundBin(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  /** Q21-shape waiting suppliers. The classic form is a
    * double-correlated EXISTS + NOT EXISTS that re-scans lineitem
    * three times; here both collapse into ONE per-order aggregation —
    * `n_supp ≥ 2 ∧ n_late_supp = 1` reproduces
    * "another supplier exists, no OTHER supplier was late", and when
    * n_late_supp = 1 the late supplier is recoverable as max(late
    * suppkey) with its late-line count carried alongside. One
    * lineitem⋈orders shuffle on the co-partition key, one agg. */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val ord = load(spark, dir, "orders").where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = col("l_shipdate") > col("o_orderdate") + day60
    val perOrder = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(late, col("l_suppkey"))).as("n_late_supp"),
        max(when(late, col("l_suppkey"))).as("late_supp"),
        count(when(late, lit(1))).as("late_items"))
      .where(col("n_supp") >= 2 && col("n_late_supp") === 1)
    val sup = load(spark, dir, "supplier")
    perOrder.join(broadcast(sup), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_items")).cast("long").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Q2-shape min-cost supplier (no partsupp in the fixture: unit
    * cost is the min observed l_extendedprice/l_quantity per
    * (part, supplier)). The correlated `cost = min(cost) per part`
    * subquery decorrelates into a per-part argmin window — rank over
    * (cost, suppkey) so ties are deterministic — after restricting
    * both sides: parts by type/size (broadcast), suppliers to the
    * EUROPE region (broadcast). The only data-sized stage is the one
    * (partkey, suppkey)-grain aggregation building the surrogate
    * partsupp; everything after runs at dimension grain. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = load(spark, dir, "part")
      .where(col("p_type") === "STANDARD" && col("p_size") < 10)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val region = load(spark, dir, "region").where(col("r_name") === "EUROPE")
    val nation = load(spark, dir, "nation")
    val sup = load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val li = load(spark, dir, "lineitem")
    val ps = li
      .join(broadcast(part.select(col("p_partkey"))), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(F.roundBin(min(col("l_extendedprice") / col("l_quantity")), 4).as("cost"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("cost"), col("l_suppkey"))
    ps.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(F.roundBin(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_brand"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q11-shape important stock: per-part value of NATION_3-supplied
    * lineitems vs a global-fraction threshold. Per-row values are
    * quantized to DECIMAL(20,4) so both the per-part sums and the
    * global scalar are exact (order-independent); the threshold is a
    * broadcast 1-row join. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val nation = load(spark, dir, "nation").where(col("n_name") === "NATION_3")
    val sup = load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val li = load(spark, dir, "lineitem")
    val scoped = li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("l_partkey"), col("l_extendedprice").cast("decimal(20,4)").as("v"))
    val byPart = scoped.groupBy(col("l_partkey")).agg(sum(col("v")).as("value"))
    // scale-free threshold: 3x the average per-part value, so the
    // "important" cut survives any part-count growth (a fixed fraction
    // of the grand total empties out as the catalog widens)
    val total = byPart.agg(sum(col("value")).as("grand"),
      count(lit(1)).as("nparts"))
    byPart.join(broadcast(total))
      .where(col("value").cast("double") >
        col("grand").cast("double") / col("nparts") * 3.0)
      .select(col("l_partkey"),
        F.roundBin(col("value").cast("double"), 2).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** Q20-shape part shippers: suppliers from NATION_4 who shipped
    * more than 100 units of 'blue' parts in 1996 — two chained
    * left-semi reductions (parts filter onto lineitem, qualifying
    * suppkeys onto supplier), quantities aggregated before any
    * supplier attribute is touched. */
  def q20PartShippers(spark: SparkSession, dir: String): DataFrame = {
    val greenParts = load(spark, dir, "part")
      .where(col("p_name").contains("blue")).select(col("p_partkey"))
    val li = load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val qualified = li
      .join(broadcast(greenParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .where(col("qty") > 100)
    val nation = load(spark, dir, "nation").where(col("n_name") === "NATION_4")
    load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"),
        F.roundBin(col("s_acctbal"), 2).as("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** Q22-shape idle customers: no phone column, so the country-code
    * bucket is custkey mod 7, and "idle" means no order since 2000
    * (the fixture has no order-less customers). Global scalar subquery
    * (avg positive balance) broadcast as a 1-row join; NOT EXISTS
    * recent-orders is a left-anti join on the filtered key set. */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = load(spark, dir, "customer")
      .withColumn("cntry", (col("c_custkey") % 7).cast("int"))
      .where(col("cntry").isin(0, 1, 2, 3))
    val posAvg = load(spark, dir, "customer")
      .where(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val recentOrd = load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(broadcast(posAvg))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(recentOrd, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntry"))
      .agg(count(lit(1)).as("numcust"),
        F.roundBin(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("cntry"))
  }
}
