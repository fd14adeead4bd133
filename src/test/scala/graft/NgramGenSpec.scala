package graft

import graft.functions.F
import org.apache.spark.sql.functions._

/** NgramGen generator (UDTF surface): element semantics, null/short
  * inputs, SQL LATERAL VIEW path, and plan shape (GenerateExec, no
  * intermediate array column). */
class NgramGenSpec extends SparkSpec {
  import spark.implicits._

  test("bigrams of a document, empty tokens dropped") {
    val out = Seq("  the quick  brown fox ").toDF("text")
      .select(F.ngramsGen(col("text"), 2).as("gram"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("the quick", "quick brown", "brown fox"))
  }

  test("null text and short documents generate nothing; n=1 is tokenization") {
    val df = Seq(Some("one"), None, Some("a b")).toDF("text")
    assert(df.select(F.ngramsGen(col("text"), 2).as("g")).count() == 1L)
    assert(df.select(F.ngramsGen(col("text"), 1).as("g")).count() == 3L)
  }

  test("SQL LATERAL VIEW path") {
    graft.functions.GraftFunctions.install(spark)
    Seq(("d1", "x y z")).toDF("id", "text").createOrReplaceTempView("ng_in")
    val rows = spark.sql(
      "SELECT id, gram FROM ng_in LATERAL VIEW ngrams_gen(text, 2) t AS gram")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("d1", "x y"), ("d1", "y z")))
  }

  test("plans through GenerateExec with no array materialization column") {
    val plan = Seq("a b c").toDF("text")
      .select(F.ngramsGen(col("text"), 2).as("gram"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
  }

  test("agrees with the explode-of-transform composition on fixture docs") {
    val viaGen = graft.operators.TextQueries.bigramTopk(spark, sf, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = Tables.load(spark, sf, "documents")
      .withColumn("toks", filter(split(col("text"), "\\s+"), t => t =!= ""))
      .where(size(col("toks")) >= 2)
    val viaExplode = toks
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaGen == viaExplode)
  }
}
