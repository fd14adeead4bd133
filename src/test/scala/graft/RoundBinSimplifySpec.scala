package graft

import org.apache.spark.sql.functions._
import graft.functions.{F, RoundBin}

/** The redundant-quantizer optimizer rule: fires on provable
  * identities, leaves everything else alone, and never changes
  * results.
  */
class RoundBinSimplifySpec extends SparkSpec {

  private def countRoundBins(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case _: RoundBin => n += 1
      case _ => ()
    }))
    n
  }

  test("nested round_bin with coarser-inside collapses to the inner") {
    val ord = Tables.load(spark, sf, "orders")
    val df = ord.select(F.roundBin(F.roundBin(col("o_totalprice"), 2), 4).as("p"))
    assert(countRoundBins(df) === 1)
    // and the values equal the single-round computation
    val single = ord.select(F.roundBin(col("o_totalprice"), 2).as("p"))
    assert(df.collect().map(_.getDouble(0)).toSeq
      === single.collect().map(_.getDouble(0)).toSeq)
  }

  test("nested round_bin with finer-inside is NOT collapsed (not an identity)") {
    val ord = Tables.load(spark, sf, "orders")
    val df = ord.select(F.roundBin(F.roundBin(col("o_totalprice"), 4), 2).as("p"))
    assert(countRoundBins(df) === 2)
  }

  test("round_bin over min/max of a quantized column drops the outer round") {
    val ord = Tables.load(spark, sf, "orders")
      .withColumn("price", F.roundBin(col("o_totalprice"), 2))
    val df = ord.groupBy(col("o_orderpriority"))
      .agg(F.roundBin(min(col("price")), 2).as("lo"),
        F.roundBin(max(col("price")), 2).as("hi"))
    // only the shared column-level quantizer remains; both outer
    // aggregate rounds are gone
    assert(countRoundBins(df) === 1)
    val expect = ord.groupBy(col("o_orderpriority"))
      .agg(min(col("price")).as("lo"), max(col("price")).as("hi"))
    assert(df.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
      === expect.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq)
  }

  test("round_bin over sum keeps its round (sum leaves the grid)") {
    val ord = Tables.load(spark, sf, "orders")
      .withColumn("price", F.roundBin(col("o_totalprice"), 2))
    val df = ord.groupBy(col("o_orderpriority"))
      .agg(F.roundBin(sum(col("price")), 2).as("rev"))
    assert(countRoundBins(df) === 2)
  }
}
