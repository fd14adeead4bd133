package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineQueries

/** Continuous sketch-table maintenance (ST12 × E6): after an
  * incremental multi-batch drain, every day's stored sketch must be
  * BIT-IDENTICAL to a from-scratch sketch of the same rows — register
  * max is lossless under arbitrary re-merge — and the drain must
  * genuinely run as multiple maintenance batches.
  */
class StreamSketchSpec extends SparkSpec {

  test("incrementally maintained sketch table equals a from-scratch build") {
    val (got, nBatches) = PipelineQueries.streamSketchTableCounted(spark, sf)
    assert(nBatches >= 2, s"expected an incremental drain, got $nBatches batch(es)")
    val gotRows = got.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // from-scratch: same zone rows (wire shape — user_id is a STRING
    // there, and hashing is type-sensitive), one direct sketch per day
    val exp = Tables.load(spark, sf, "events")
      .where(to_date(col("ts")) < lit(PipelineQueries.StreamCutoff))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(graft.functions.F.hllDistinct(col("user_id").cast("string"), 12).as("approx_users"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(gotRows.keySet === exp.keySet, s"day sets differ: $gotRows vs $exp")
    gotRows.foreach { case (dt, est) =>
      assert(est === exp(dt),
        s"$dt: incremental estimate $est != from-scratch ${exp(dt)} — merge lost information")
    }
    // sanity: estimates are near the exact per-day distincts
    val exact = Tables.load(spark, sf, "events")
      .where(to_date(col("ts")) < lit(PipelineQueries.StreamCutoff))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    gotRows.foreach { case (dt, est) =>
      val err = math.abs(est - exact(dt)).toDouble / math.max(1, exact(dt))
      assert(err <= 0.06, s"$dt: est=$est exact=${exact(dt)} err=$err")
    }
  }
}
