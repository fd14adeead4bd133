package graft

import org.apache.spark.sql.functions._
import graft.functions.{F, QSketchBuffer}

/** qsketch family (mergeable log-histogram quantile sketch): value-
  * relative accuracy bound, partitioning invariance, the lossless
  * union contract behind q_quantile_rollup, sign/zero/edge handling,
  * and SQL registration.
  */
class QSketchSpec extends SparkSpec {

  test("quantile estimates within the 2^-(sub+1) relative bound (sub=5)") {
    // lognormal-ish positive data spanning several octaves — the
    // long-tailed class the sketch exists for. Exact quantiles from a
    // driver-side sort; nearest-rank on both sides.
    val xs = (1 to 20000).map(i => math.exp((i * 2654435761L % 100003).toDouble / 100003 * 8 - 2))
    val df = spark.createDataFrame(xs.map(Tuple1(_))).toDF("v")
    val sorted = xs.sorted
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = df.agg(F.qSketchQuantile(F.qSketch(col("v"), 5), p).as("q"))
        .head().getDouble(0)
      val exact = sorted(math.max(0, math.ceil(p * xs.size).toInt - 1))
      val err = math.abs(est - exact) / exact
      assert(err <= 1.0 / 64 + 1e-9, s"p=$p est=$est exact=$exact err=$err")
    }
  }

  test("estimate invariant under partitioning (merge is exact)") {
    val df = spark.range(30000).select((col("id") * 2654435761L % 99991).cast("double").as("v"))
    val one = df.repartition(1).agg(F.qSketchQuantile(F.qSketch(col("v")), 0.9)).head().getDouble(0)
    val many = df.repartition(17).agg(F.qSketchQuantile(F.qSketch(col("v")), 0.9)).head().getDouble(0)
    assert(one === many)
  }

  test("union of stored sketches == direct sketch (lossless rollup)") {
    // the q_quantile_rollup contract: per-group sketches folded by
    // qsketch_union must yield the same serialized sketch as one
    // direct pass over the raw rows
    val df = spark.range(25000)
      .select((col("id") % 13).as("g"), (col("id") * 6361 % 9973).cast("double").as("v"))
    val direct = df.agg(F.qSketch(col("v"), 5).as("sk"))
      .head().getAs[Array[Byte]](0)
    val viaUnion = df.groupBy(col("g")).agg(F.qSketch(col("v"), 5).as("sk"))
      .agg(F.qSketchUnion(col("sk"), 5).as("usk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, viaUnion),
      "sketch-table fold must be byte-identical to the direct sketch")
  }

  test("negatives, zeros, and mixed signs order correctly") {
    import spark.implicits._
    val vs = Seq(-100.0, -1.0, -0.5, 0.0, 0.0, 0.5, 1.0, 100.0)
    val df = vs.toDF("v")
    val p0 = df.agg(F.qSketchQuantile(F.qSketch(col("v"), 5), 0.0)).head().getDouble(0)
    val p50 = df.agg(F.qSketchQuantile(F.qSketch(col("v"), 5), 0.5)).head().getDouble(0)
    val p100 = df.agg(F.qSketchQuantile(F.qSketch(col("v"), 5), 1.0)).head().getDouble(0)
    assert(p0 < -99 && p0 > -104, s"min bucket: $p0")          // ≈ -100
    assert(p50 === 0.0, s"median of the zero-straddling set: $p50")
    assert(p100 > 99 && p100 < 104, s"max bucket: $p100")      // ≈ +100
  }

  test("nulls and NaN excluded; empty sketch estimates NaN") {
    import spark.implicits._
    val est = Seq(Some(5.0), None, Some(Double.NaN), Some(5.0))
      .toDF("v").agg(F.qSketchQuantile(F.qSketch(col("v"), 5), 0.99))
      .head().getDouble(0)
    assert(math.abs(est - 5.0) / 5.0 <= 1.0 / 64, s"est=$est")
    val empty = spark.range(0).agg(
      F.qSketchQuantile(F.qSketch(col("id").cast("double"), 5), 0.5)).head().getDouble(0)
    assert(empty.isNaN, "empty sketch must estimate NaN")
  }

  test("small exact sets: every rank recovered within its bucket") {
    // nearest-rank with exact counts: a 4-element set probed at the 4
    // quartile boundaries must step through all 4 values' buckets
    import spark.implicits._
    val df = Seq(1.0, 10.0, 100.0, 1000.0).toDF("v")
    val got = Seq(0.25, 0.5, 0.75, 1.0).map { p =>
      df.agg(F.qSketchQuantile(F.qSketch(col("v"), 5), p)).head().getDouble(0)
    }
    got.zip(Seq(1.0, 10.0, 100.0, 1000.0)).foreach { case (e, x) =>
      assert(math.abs(e - x) / x <= 1.0 / 64 + 1e-9, s"est=$e exact=$x")
    }
  }

  test("driver-side round trip: serialize/deserialize/quantile agree") {
    val buf = new QSketchBuffer(5)
    (1 to 1000).foreach(i => buf.add(i.toDouble))
    val bytes = buf.serialized
    val p50 = QSketchBuffer.quantileOf(bytes, 0.5)
    assert(math.abs(p50 - 500.0) / 500.0 <= 1.0 / 64, s"p50=$p50")
    val re = QSketchBuffer.deserialize(bytes).serialized
    assert(java.util.Arrays.equals(bytes, re), "round trip must be stable")
  }

  test("SQL registration: qsketch family usable from spark.sql") {
    graft.functions.GraftFunctions.install(spark)
    spark.range(10000).select(col("id").cast("double").as("v"))
      .createOrReplaceTempView("qs_probe")
    val est = spark.sql(
      "SELECT qsketch_quantile(qsketch(v, 5), 0.5) AS q FROM qs_probe")
      .head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 <= 1.0 / 64, s"sql est=$est")
  }

  test("out-of-range sub fails at analysis time") {
    val e = intercept[Exception] {
      spark.range(10).agg(F.qSketch(col("id").cast("double"), 0)).collect()
    }
    assert(e.getMessage.contains("1 <= sub <= 16"), e.getMessage)
  }
}
