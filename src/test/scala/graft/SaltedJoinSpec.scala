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
}
