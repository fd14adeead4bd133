package graft

import org.apache.spark.sql.functions._
import graft.functions.{F, KmvBuffer}

/** KMV theta sketch: exactness below capacity, estimator accuracy at
  * capacity, partitioning invariance, the union contract, and the
  * family's reason to exist — intersection estimates over stored
  * sketches.
  */
class KmvSpec extends SparkSpec {

  test("below capacity the sketch is exact (distinct hash set)") {
    for (n <- Seq(1L, 100L, 1000L)) {
      val est = spark.range(n).agg(F.kmvEstimate(F.kmvSketch(col("id"), 1024)))
        .head().getLong(0)
      assert(est === n, s"n=$n")
    }
  }

  test("at capacity: estimate within 4/sqrt(k) of exact") {
    // k=1024 → σ ≈ 1/√k ≈ 3.1%; fixed data, deterministic gate
    for (n <- Seq(20000L, 100000L)) {
      val est = spark.range(n).agg(F.kmvEstimate(F.kmvSketch(col("id"), 1024)))
        .head().getLong(0)
      val err = math.abs(est - n).toDouble / n
      assert(err <= 4.0 / math.sqrt(1024), s"n=$n est=$est err=$err")
    }
  }

  test("estimate invariant under partitioning (merge keeps k smallest)") {
    val df = spark.range(60000).select((col("id") * 7919 % 40009).as("v"))
    val one = df.repartition(1).agg(F.kmvEstimate(F.kmvSketch(col("v"), 256))).head().getLong(0)
    val many = df.repartition(13).agg(F.kmvEstimate(F.kmvSketch(col("v"), 256))).head().getLong(0)
    assert(one === many)
  }

  test("union of stored sketches == direct sketch (byte-identical)") {
    val df = spark.range(50000)
      .select((col("id") % 11).as("g"), (col("id") * 6361 % 30011).as("v"))
    val direct = df.agg(F.kmvSketch(col("v"), 512).as("sk")).head().getAs[Array[Byte]](0)
    val viaUnion = df.groupBy(col("g")).agg(F.kmvSketch(col("v"), 512).as("sk"))
      .agg(F.kmvUnion(col("sk"), 512).as("u")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, viaUnion))
  }

  test("intersection estimate: exact below capacity, bounded at capacity") {
    import spark.implicits._
    // exact regime: two small overlapping ranges
    val aS = spark.range(0, 800).agg(F.kmvSketch(col("id"), 1024).as("sk"))
      .head().getAs[Array[Byte]](0)
    val bS = spark.range(500, 1300).agg(F.kmvSketch(col("id"), 1024).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(KmvBuffer.intersectEstimateOf(aS, bS) === 300L, "exact regime")
    // estimator regime: 60k-element sets overlapping in 20k
    val aL = spark.range(0, 60000).agg(F.kmvSketch(col("id"), 2048).as("sk"))
      .head().getAs[Array[Byte]](0)
    val bL = spark.range(40000, 100000).agg(F.kmvSketch(col("id"), 2048).as("sk"))
      .head().getAs[Array[Byte]](0)
    val est = KmvBuffer.intersectEstimateOf(aL, bL)
    // σ grows with the small retained-intersection sample; 20% is a
    // generous deterministic gate for 20k/60k overlap at k=2048
    assert(math.abs(est - 20000L) <= 4000L, s"est=$est exact=20000")
    // disjoint sets estimate zero
    val cL = spark.range(200000, 260000).agg(F.kmvSketch(col("id"), 2048).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(KmvBuffer.intersectEstimateOf(aL, cL) === 0L, "disjoint")
    val _ = Seq(1).toDF("x") // keep implicits import used
  }

  test("nulls ignored; string inputs accepted; SQL registration") {
    import spark.implicits._
    val est = Seq(Some("a"), None, Some("b"), Some("a"))
      .toDF("s").agg(F.kmvEstimate(F.kmvSketch(col("s"), 64))).head().getLong(0)
    assert(est === 2L)
    graft.functions.GraftFunctions.install(spark)
    spark.range(800).createOrReplaceTempView("kmv_probe")
    val sql = spark.sql(
      "SELECT kmv_estimate(kmv_sketch(id, 1024)) AS e FROM kmv_probe").head().getLong(0)
    assert(sql === 800L, s"below capacity must be exact, got $sql")
  }

  test("out-of-range k fails at analysis time") {
    val e = intercept[Exception] {
      spark.range(10).agg(F.kmvSketch(col("id"), 8)).collect()
    }
    assert(e.getMessage.contains("16 <= k <= 65536"), e.getMessage)
  }
}
