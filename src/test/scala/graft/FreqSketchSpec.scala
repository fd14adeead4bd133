package graft

import org.apache.spark.sql.functions._
import graft.functions.F
import graft.operators.TextQueries

/** Misra-Gries frequent-items sketch + the heavy-hitters operator
  * (SURVEY.md §2.10 UDAF surface, §2.11 E4). The sketch's defining
  * property — every key with true frequency > N/(capacity+1) survives,
  * with a lower-bound counter within N/(capacity+1) of truth, under
  * ANY partitioning — is checked on a constructed skewed stream whose
  * vocabulary EXCEEDS the sketch capacity (the fixture corpus's ~30
  * word vocab never exercises eviction).
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish stream: key k_i appears ceil(3000 / i) times for
  // i in 1..200 — vocab 200 > capacity 32, total N ≈ 17.7k.
  private lazy val stream: Seq[String] =
    (1 to 200).flatMap(i => Seq.fill((3000 + i - 1) / i)(f"k_$i%03d"))
  private lazy val trueCounts: Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def sketch(partitions: Int, capacity: Int): Map[String, Long] = {
    val df = spark.createDataset(stream).toDF("key")
      .repartition(partitions, col("key"))
    df.agg(F.freqSketch(col("key"), capacity).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.token"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("MG guarantee: heavy keys survive with lower-bound counts, any partitioning") {
    val n = stream.size.toLong
    for (parts <- Seq(1, 4, 13)) {
      val got = sketch(parts, 32)
      assert(got.size <= 32)
      val bound = n / 33.0
      trueCounts.foreach { case (k, c) =>
        if (c > bound) {
          assert(got.contains(k), s"heavy key $k (count $c > $bound) evicted at $parts partitions")
        }
      }
      got.foreach { case (k, est) =>
        val truth = trueCounts(k)
        assert(est <= truth, s"$k overestimated: $est > $truth")
        assert(est >= truth - bound - 1, s"$k undershoots the MG bound: $est vs $truth")
      }
    }
  }

  test("exact when vocabulary fits the capacity") {
    val got = sketch(4, 256)
    assert(got === trueCounts)
  }

  test("SQL registration: freq_sketch agrees with the Column API") {
    Tables.load(spark, sf, "documents").createOrReplaceTempView("fs_docs")
    val viaSql = spark.sql(
      """SELECT freq_sketch(token, 64) AS sk FROM (
        |  SELECT explode(split(text, '\\s+')) AS token FROM fs_docs)""".stripMargin)
      .select(explode(col("sk")).as("e"))
      .select(col("e.token"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaApi = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), "\\s+")).as("token"))
      .agg(F.freqSketch(col("token"), 64).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.token"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql === viaApi)
  }

  test("heavyHitters equals the exact top-k (fixture corpus)") {
    val exact = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), "\\s+")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = TextQueries.heavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exact)
  }

  test("heavyHitters exact on the synthetic stream when top-k clears the bound") {
    // capacity 32, k 5: top-5 counts (3000, 1500, 1000, 750, 600) all
    // clear N/33 ≈ 537, so sketch + exact recount MUST return the true
    // top-5 regardless of which tail keys the sketch happens to retain.
    val df = spark.createDataset(stream).toDF("token").repartition(7)
    val cand = df.agg(F.freqSketch(col("token"), 32).as("sk"))
      .select(explode(col("sk")).as("e")).select(col("e.token"))
      .collect().map(_.getString(0)).toSeq
    val got = df.where(col("token").isin(cand: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = trueCounts.toSeq.sortBy { case (k, c) => (-c, k) }.take(5)
    assert(got === exact)
  }
}
