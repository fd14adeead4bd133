package graft

import org.apache.spark.sql.functions._
import graft.functions.F

/** hll_distinct (single-binary-buffer HLL aggregate): accuracy vs the
  * 1.04/√m theoretical bound, partitioning invariance (register max
  * is commutative/associative), null semantics, typed inputs, and SQL
  * registration.
  */
class HllSpec extends SparkSpec {

  test("estimate within ~3 sigma of exact across cardinalities (bits=14)") {
    // σ = 1.04/√2^14 ≈ 0.81%; assert 3% — fixed data, so this is a
    // deterministic gate, not a statistical one. Cardinalities chosen
    // to land in the linear-counting range, the crossover zone, and
    // the raw-estimator range.
    for (n <- Seq(1000L, 20000L, 60000L, 200000L)) {
      val est = spark.range(n)
        .agg(F.hllDistinct(col("id"), 14).as("e"))
        .head().getLong(0)
      val err = math.abs(est - n).toDouble / n
      assert(err <= 0.03, s"n=$n est=$est err=$err")
    }
  }

  test("estimate is invariant under partitioning (merge associativity)") {
    val df = spark.range(50000).select((col("id") * 7919 % 30011).as("v"))
    val one = df.repartition(1).agg(F.hllDistinct(col("v"), 12)).head().getLong(0)
    val many = df.repartition(13).agg(F.hllDistinct(col("v"), 12)).head().getLong(0)
    assert(one === many)
  }

  test("nulls ignored; string and double inputs hash distinctly") {
    import spark.implicits._
    val strs = Seq(Some("a"), Some("b"), None, Some("a"), Some("c"))
      .toDF("s").agg(F.hllDistinct(col("s"), 10)).head().getLong(0)
    assert(strs === 3L, "string input with nulls")
    val dbls = Seq(1.5, 2.5, 1.5, 3.25).toDF("d")
      .agg(F.hllDistinct(col("d"), 10)).head().getLong(0)
    assert(dbls === 3L, "double input")
    val empty = spark.range(0).agg(F.hllDistinct(col("id"), 10)).head().getLong(0)
    assert(empty === 0L, "empty input estimates zero")
  }

  test("small exact range: estimate equals exact (linear counting)") {
    // far below 2.5m every register collision is improbable — the
    // estimate must be EXACT for tiny groups (the property users rely
    // on when eyeballing small-group output)
    for (n <- Seq(1L, 10L, 100L)) {
      val est = spark.range(n).agg(F.hllDistinct(col("id"), 14)).head().getLong(0)
      assert(est === n, s"n=$n")
    }
  }

  test("SQL registration: hll_distinct usable from spark.sql") {
    graft.functions.GraftFunctions.install(spark)
    spark.range(5000).createOrReplaceTempView("hll_probe")
    val est = spark.sql(
      "SELECT hll_distinct(id, 14) AS e FROM hll_probe").head().getLong(0)
    assert(math.abs(est - 5000L) <= 150, s"sql est=$est")
    val defBits = spark.sql(
      "SELECT hll_distinct(id) AS e FROM hll_probe").head().getLong(0)
    assert(defBits === est, "default bits must be 14")
  }

  test("sketch persistence: union of stored sketches == direct estimate") {
    // The mergeable-summaries contract behind q_sketch_rollup: build
    // one sketch per group (simulating the stored per-day sketch
    // table), register-max-fold them, and require the estimate to be
    // BIT-IDENTICAL to a direct hll_distinct over the raw rows —
    // register max is lossless under re-merge, so sketch-table rollup
    // loses nothing vs rescanning the corpus.
    val df = spark.range(40000)
      .select((col("id") % 17).as("g"), (col("id") * 6361 % 9973).as("v"))
    val direct = df.agg(F.hllDistinct(col("v"), 12)).head().getLong(0)
    val viaSketches = df
      .groupBy(col("g")).agg(F.hllSketch(col("v"), 12).as("sk"))
      .agg(F.hllEstimate(F.hllUnion(col("sk"), 12)).as("e"))
      .head().getLong(0)
    assert(viaSketches === direct, "sketch-table fold must equal direct estimate")
    assert(math.abs(direct - 9973L).toDouble / 9973 <= 0.05, s"direct=$direct")
  }

  test("hll_estimate of a single stored sketch matches its aggregate estimate") {
    val direct = spark.range(7000).agg(F.hllDistinct(col("id"), 12)).head().getLong(0)
    val stored = spark.range(7000).agg(F.hllSketch(col("id"), 12).as("sk"))
      .select(F.hllEstimate(col("sk")).as("e")).head().getLong(0)
    assert(stored === direct)
  }

  test("out-of-range bits fails at analysis time, not on executors") {
    val e = intercept[Exception] {
      spark.range(10).agg(F.hllDistinct(col("id"), 3)).collect()
    }
    assert(e.getMessage.contains("4 <= bits <= 18"), e.getMessage)
  }

  test("hll_estimate rejects non-register-file binary with a clear error") {
    // a 5-byte blob is no 2^bits register file: estimateOf's
    // power-of-two require must surface as a readable failure, not a
    // silent wrong estimate
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(Array[Byte](1, 2, 3, 4, 5)).toDF("sk")
        .select(F.hllEstimate(col("sk"))).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("not a register file"), msg)
  }

  test("map-side partial aggregation: plan uses ObjectHashAggregate") {
    val plan = spark.range(1000).groupBy((col("id") % 5).as("g"))
      .agg(F.hllDistinct(col("id"), 14))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate (single-object buffer path), got:\n$plan")
  }
}
