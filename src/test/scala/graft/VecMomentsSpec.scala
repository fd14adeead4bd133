package graft

import graft.functions.F
import org.apache.spark.sql.functions._

/** VecMomentsAgg: partition invariance, null skipping, ragged-dim
  * rejection, and the dimstats/entropy queries' invariants. */
class VecMomentsSpec extends SparkSpec {
  import spark.implicits._

  test("moments buffer: exact count, sums independent of partitioning") {
    val vecs = Seq(
      Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array(-1.0f, 0.5f), Array(0.0f, 0.0f))
    def run(parts: Int): Seq[Double] = vecs.toDF("v").repartition(parts)
      .agg(F.vecMoments(col("v")).as("m"))
      .collect()(0).getSeq[Double](0)
    val m1 = run(1)
    assert(m1(0) == 4.0)                      // n
    assert(math.abs(m1(1) - 3.0) < 1e-9)      // sum dim0
    assert(math.abs(m1(2) - 6.5) < 1e-9)      // sum dim1
    assert(math.abs(m1(3) - 11.0) < 1e-9)     // sumsq dim0
    assert(math.abs(m1(4) - 20.25) < 1e-9)    // sumsq dim1
    assert(run(3).zip(m1).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("null vectors are skipped, not counted") {
    val df = Seq(Some(Array(1.0f, 1.0f)), None, Some(Array(2.0f, 2.0f)))
      .toDF("v")
    val m = df.agg(F.vecMoments(col("v")).as("m")).collect()(0).getSeq[Double](0)
    assert(m(0) == 2.0 && math.abs(m(1) - 3.0) < 1e-9)
  }

  test("ragged dimensions fail loudly") {
    val df = Seq(Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)).toDF("v")
      .coalesce(1)
    val e = intercept[Exception] {
      df.agg(F.vecMoments(col("v")).as("m")).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
  }

  test("vecDimstats: fixture stats match a driver-side recompute for one (label, dim)") {
    val rows = graft.operators.VectorQueries.vecDimstats(spark, sf).collect()
    assert(rows.nonEmpty)
    val r0 = rows.head
    val label = r0.getInt(0)
    val vals = Tables.load(spark, sf, "embeddings")
      .where(col("label") === label)
      .select(element_at(col("embedding"), 1).cast("double"))
      .collect().map(_.getDouble(0))
    val mean = vals.sum / vals.length
    val std = math.sqrt(vals.map(x => x * x).sum / vals.length - mean * mean)
    assert(math.abs(r0.getDouble(2) - mean) < 1e-3, s"mean ${r0.getDouble(2)} vs $mean")
    assert(math.abs(r0.getDouble(3) - std) < 1e-3, s"std ${r0.getDouble(3)} vs $std")
  }

  test("sourceEntropy: bounded by log2(vocab), positive token counts") {
    val rows = graft.operators.TextQueries.sourceEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, vocab, h) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n >= vocab && vocab > 0)
      assert(h >= -1e-9, s"${r.getString(0)}: negative entropy $h")
      assert(h <= math.log(vocab.toDouble) / math.log(2.0) + 1e-9,
        s"${r.getString(0)}: H=$h > log2($vocab)")
    }
  }
}
