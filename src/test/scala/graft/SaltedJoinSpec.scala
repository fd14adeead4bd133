package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Salted join ≡ plain join (same multiset of result rows), on both a
  * fixture where some keys cross the hot threshold and one where none
  * do (pass-through), plus a synthetic heavy-skew fixture.
  */
class SaltedJoinSpec extends SparkSpec {

  test("salted lineitem⋈orders equals the plain join (mixed hot/cold)") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val ord = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))

    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
      .collect().map(_.toString).sorted

    // threshold 6 ⇒ orders with 6-7 lineitems salt, the rest pass through
    val salted = SaltedJoin.join(li, ord, "l_orderkey", "o_orderkey",
        saltFactor = 8, saltOn = Seq(col("l_orderkey"), col("l_linenumber")),
        hotKeyThreshold = 6L)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
      .collect().map(_.toString).sorted

    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("no key above threshold degenerates to the plain join result") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val ord = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val plainCount = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    val salted = SaltedJoin.join(li, ord, "l_orderkey", "o_orderkey",
      saltFactor = 8, saltOn = Seq(col("l_orderkey"), col("l_linenumber")),
      hotKeyThreshold = 1000000L)
    assert(salted.count() === plainCount)
  }

  test("heavy skew: one key with 10k fact rows joins correctly") {
    import spark.implicits._
    // key 1 is hot (10_000 rows), keys 2..101 have one row each
    val fact = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (2 to 101).map(k => (k.toLong, 0L))).toDF("k", "seq")
    val dim = (1 to 101).map(k => (k.toLong, s"d_$k")).toDF("dk", "payload")
    val out = SaltedJoin.join(fact, dim, "k", "dk",
      saltFactor = 8, saltOn = Seq(col("k"), col("seq")),
      hotKeyThreshold = 100L)
    assert(out.count() === 10100L)
    // the hot key's rows joined exactly once each
    assert(out.where(col("k") === 1L).count() === 10000L)
  }

  test("salt values are deterministic and span the factor") {
    val li = Tables.load(spark, sf, "lineitem")
    val salts = li.select(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
        lit(8L)).cast("int").as("s"))
      .groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salts.keySet === (0 until 8).toSet)
  }

  test("AQE splits a skewed sort-merge join at runtime (the SCALE.md claim, r9)") {
    // SCALE.md's complementary skew story — salting is the
    // PRE-DECLARED mitigation, AQE the RUNTIME one — asserted
    // mechanically: one hot key holding ~80% of rows, broadcast
    // disabled so the join must sort-merge, skew thresholds lowered
    // to fixture scale; the executed adaptive plan must carry the
    // skew=true marker (OptimizeSkewedJoin split the hot partition).
    // synthetic heavy skew (90% of 200k rows on key 0), built with
    // multi-partition parallelism: AQE splits a skewed reduce
    // partition by MAPPER ranges, so splitting requires >1 map task
    // feeding the shuffle
    val left = spark.range(0, 200000, 1, 8)
      .select(when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val right = spark.range(0, 200000, 1, 8).select(col("id").as("k"))
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = left.join(right, Seq("k"))
      // execute the join's own queryExecution (a count() would plan a
      // separate query and leave this one's AQE plan non-final)
      val n = joined.queryExecution.toRdd.map(_ => 1L).fold(0L)(_ + _)
      assert(n == left.count(), "inner join on complete key set must preserve rows")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
    }
  }
}
