package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The custom AsOfMergeJoinExec physical operator: agreement with the
  * union+window formulation (same declared semantics), edge cases the
  * merge pointer must handle (ties, no-match keys, null times, key
  * runs), and the plan shape (the exec node plans, with one exchange
  * per side). */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    // (key, ltime, lval)
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 30L, "l3"),
    ("b", 5L, "l4"), ("b", 100L, "l5"),
    ("c", 50L, "l6"),               // key with no right rows at all
    ("d", 1L, "l7")                 // right rows exist but all later
  ).toDF("k", "lt", "lval")

  private def rightDf = Seq(
    ("a", 10L, "r10"), ("a", 25L, "r25"),   // tie at 10 (<= matches)
    ("b", 99L, "r99"),
    ("d", 2L, "r2")
  ).toDF("k", "rt", "rval")

  test("matches the union+window formulation row for row") {
    val native = AsOfJoin.asOfNative(leftDf, rightDf, Seq("k"), "lt", "rt")
      .select("k", "lt", "lval", "rt", "rval")
    val window = AsOfJoin.asOf(leftDf, rightDf, Seq("k"), "lt", "rt")
      .select("k", "lt", "lval", "rt", "rval")
    val n = native.collect().map(_.toString).sorted.toSeq
    val w = window.collect().map(_.toString).sorted.toSeq
    assert(n == w, s"\nnative: $n\nwindow: $w")
  }

  test("edge semantics: inclusive tie, latest wins, no-match keys null") {
    val out = AsOfJoin.asOfNative(leftDf, rightDf, Seq("k"), "lt", "rt")
      .select("k", "lt", "rval").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.getString(2)))
      .toMap
    assert(out(("a", 10L)).contains("r10"))   // rt == lt matches
    assert(out(("a", 20L)).contains("r10"))
    assert(out(("a", 30L)).contains("r25"))   // latest <= 30
    assert(out(("b", 5L)).isEmpty)            // right later only
    assert(out(("b", 100L)).contains("r99"))
    assert(out(("c", 50L)).isEmpty)           // key absent on right
    assert(out(("d", 1L)).isEmpty)            // d's right row is at 2 > 1
  }

  test("null right times never match; null left times match nothing") {
    val l = Seq(("a", Some(10L), "l1"), ("a", None, "l2")).toDF("k", "lt", "lval")
    val r = Seq(("a", None: Option[Long], "rNull"), ("a", Some(5L), "r5"))
      .toDF("k", "rt", "rval")
    val out = AsOfJoin.asOfNative(l, r, Seq("k"), "lt", "rt")
      .select("lval", "rval").collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(out("l1").contains("r5"))
    assert(out("l2").isEmpty)
  }

  test("fixture agreement: native and window implementations hash-identical at sf") {
    val native = graft.operators.TpchQueries.asofNativeLineitemOrder(spark, sf)
    val window = graft.operators.TpchQueries.asofLineitemOrder(spark, sf)
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("plans through AsOfMergeJoin with one exchange per side") {
    val df = AsOfJoin.asOfNative(leftDf, rightDf, Seq("k"), "lt", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"), plan)
  }

  test("forward direction: earliest at-or-after, ties inclusive, stale keys null (r8)") {
    val out = AsOfJoin.asOfNative(leftDf, rightDf, Seq("k"), "lt", "rt",
        forward = true)
      .select("k", "lt", "rval").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.getString(2))).toMap
    // brute-force expected: min rt >= lt per key
    val rights = Seq(("a", 10L, "r10"), ("a", 25L, "r25"), ("b", 99L, "r99"), ("d", 2L, "r2"))
    val expected = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 5L),
      ("b", 100L), ("c", 50L), ("d", 1L)).map { case (k, lt) =>
      (k, lt) -> rights.filter(r => r._1 == k && r._2 >= lt)
        .sortBy(_._2).headOption.map(_._3)
    }.toMap
    assert(out === expected, s"forward as-of mismatch:\n got $out\n exp $expected")
    // spot meanings: tie at 10 matches (inclusive); 30 has no future
    // right; d@1 now matches r2 (backward leaves it null)
    assert(out(("a", 10L)) === Some("r10"))
    assert(out(("a", 30L)) === None)
    assert(out(("d", 1L)) === Some("r2"))
  }

  test("forward direction: null times on either side never match (r8)") {
    val l = Seq(("a", Some(10L), "l1"), ("a", None, "l2"), ("b", Some(5L), "l3"))
      .toDF("k", "lt", "lval")
    val r = Seq(("a", Some(15L), "r15"), ("a", None, "rN"), ("b", None, "rN2"))
      .toDF("k", "rt", "rval")
    val out = AsOfJoin.asOfNative(l, r, Seq("k"), "lt", "rt", forward = true)
      .select("k", "lval", "rval").collect()
      .map(x => (x.getString(0), x.getString(1)) -> Option(x.getString(2))).toMap
    assert(out(("a", "l1")) === Some("r15")) // normal forward match
    assert(out(("a", "l2")) === None)        // null left time matches nothing
    assert(out(("b", "l3")) === None)        // only a null-time right: no match
  }

  test("forward matches a window-formulation twin on the fixture tables (r8)") {
    import org.apache.spark.sql.functions._
    // distinct: the twin's groupBy would dedup the fixture's reused
    // (orderkey, linenumber) rows while the native op preserves them
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_suppkey"), lit(10)).cast("int").as("k"), col("l_shipdate"))
      .distinct()
    val ord = Tables.load(spark, sf, "orders")
      .groupBy(pmod(col("o_custkey"), lit(10)).cast("int").as("k"),
        col("o_orderdate").as("rt"))
      .agg(max(col("o_orderkey")).as("okey"))
    val native = AsOfJoin.asOfNative(li, ord, Seq("k"), "l_shipdate", "rt",
        forward = true)
      .select("l_orderkey", "l_linenumber", "k", "okey", "rt")
    // independent formulation: min-at-or-after via plain join + agg
    // conditional min keeps no-future-right lefts (a WHERE would drop
    // their whole group, losing the null-payload row native emits)
    val cand = li.join(ord.select(col("k"), col("rt")), Seq("k"), "left")
      .groupBy(col("l_orderkey"), col("l_linenumber"), col("k"), col("l_shipdate"))
      .agg(min(when(col("rt") >= col("l_shipdate"), col("rt"))).as("rt"))
    val ord2 = ord.select(col("k").as("k2"), col("rt").as("r_rt"), col("okey"))
    val twin = cand.join(ord2,
        col("k") === col("k2") && col("rt") === col("r_rt"), "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("k"),
        col("okey"), col("rt"))
    val n = native.collect().map(_.toString).sorted.toSeq
    val w = twin.collect().map(_.toString).sorted.toSeq
    assert(n == w, s"forward native != join twin (sizes ${n.size}/${w.size})")
  }

  test("mismatched time or key types fail at construction, not silently (r8)") {
    // DateType right time vs LongType left time: the merge would read
    // the right value through the LEFT type and mis-compare — must
    // fail loudly like the union+window formulation's unionByName does
    val rDate = rightDf.withColumn("rt", to_date(lit("2024-01-01")))
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(leftDf, rDate, Seq("k"), "lt", "rt")
    }
    assert(e1.getMessage.contains("time type mismatch"), e1.getMessage)
    // key type mismatch: int right key vs string left key
    val rIntKey = rightDf.withColumn("k", lit(1))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(leftDf, rIntKey, Seq("k"), "lt", "rt")
    }
    assert(e2.getMessage.contains("key type mismatch"), e2.getMessage)
  }
}
