package graft

import graft.operators.{AsOfJoin, TpchQueries}
import org.apache.spark.sql.functions._

/** As-of join: union+window formulation checked against a brute-force
  * driver-side recomputation on sf0.001.
  */
class AsOfJoinSpec extends SparkSpec {

  test("asofLineitemOrder matches brute-force latest-on-or-before") {
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // right side dedup: per (k, date) max orderkey
    val byBucket = orders
      .groupBy(o => ((o._2 % 10).toInt, o._3))
      .map { case ((k, t), rows) => (k, t, rows.map(_._1).max) }
      .toSeq.groupBy(_._1)

    def expected(k: Int, ts: Long): Option[(Long, Long)] =
      byBucket.getOrElse(k, Seq.empty)
        .filter(_._2 <= ts)
        .sortBy(_._2)
        .lastOption.map(r => (r._3, r._2))

    // (orderkey, linenumber) — and even (orderkey, linenumber, bucket)
    // — are NOT unique in the fixture, so compare full multisets
    val li = Tables.load(spark, sf, "lineitem")
      .where(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_suppkey"), lit(10)).cast("int").as("k"),
        unix_timestamp(col("l_shipdate")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSeq

    val expMultiset = li
      .map { case (ok, ln, k, ts) => (ok, ln, k, expected(k, ts).map(_._1)) }
      .sorted(Ordering.by((x: (Long, Int, Int, Option[Long])) =>
        (x._1, x._2, x._3, x._4.getOrElse(-1L))))

    val gotMultiset = TpchQueries.asofLineitemOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        Option(r.getAs[java.lang.Long]("asof_orderkey")).map(_.toLong)))
      .toSeq
      .sorted(Ordering.by((x: (Long, Int, Int, Option[Long])) =>
        (x._1, x._2, x._3, x._4.getOrElse(-1L))))

    assert(gotMultiset.size === li.size)
    assert(gotMultiset === expMultiset)
  }

  test("asOf generic: ties at equal timestamps match (>= semantics)") {
    import spark.implicits._
    val left = Seq((1, 100L, "l1"), (1, 50L, "l2"), (2, 10L, "l3"))
      .toDF("k", "lt", "lname")
    val right = Seq((1, 100L, "r-100"), (1, 60L, "r-60"), (2, 99L, "r-99"))
      .toDF("k", "rt", "rname")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt")
      .select("lname", "rname").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("l1") === Some("r-100")) // equal ts matches
    assert(out("l2") === None)          // no right <= 50
    assert(out("l3") === None)          // right is later
  }
}
