package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Salted join ≡ plain join (same multiset of result rows), with the
  * hot key spread over saltFactor sub-keys.
  */
class SaltedJoinSpec extends SparkSpec {

  test("salted lineitem⋈orders equals the plain join") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val ord = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))

    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
      .collect().map(_.toString).sorted

    val salted = SaltedJoin.join(li, ord, "l_orderkey", "o_orderkey",
        saltFactor = 8, saltOn = Seq(col("l_orderkey"), col("l_linenumber")))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
      .collect().map(_.toString).sorted

    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salt values are deterministic and span the factor") {
    val li = Tables.load(spark, sf, "lineitem")
    val salts = li.select(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
        lit(8L)).cast("int").as("s"))
      .groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salts.keySet === (0 until 8).toSet)
  }
}
