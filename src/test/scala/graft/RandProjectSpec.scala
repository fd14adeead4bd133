package graft

import graft.functions.F
import org.apache.spark.sql.functions._

/** RandProject (Johnson-Lindenstrauss sign projection): linearity,
  * determinism, output shape, and the fixture audit's recall gate. */
class RandProjectSpec extends SparkSpec {
  import spark.implicits._

  private val k = 16

  test("projection is linear: P(a) + P(b) == P(a + b) elementwise") {
    val a = Array.tabulate(32)(i => (i * 0.25f - 3.0f))
    val b = Array.tabulate(32)(i => (1.5f - i * 0.125f))
    val df = Seq((a, b)).toDF("a", "b")
      .withColumn("ab", expr("zip_with(a, b, (x, y) -> x + y)"))
    val row = df.select(
      F.randProject(col("a"), k, 7L).as("pa"),
      F.randProject(col("b"), k, 7L).as("pb"),
      F.randProject(col("ab"), k, 7L).as("pab")).collect()(0)
    val (pa, pb, pab) =
      (row.getSeq[Float](0), row.getSeq[Float](1), row.getSeq[Float](2))
    assert(pa.length == k && pab.length == k)
    pa.indices.foreach { i =>
      assert(math.abs(pa(i) + pb(i) - pab(i)) < 1e-4,
        s"dim $i: ${pa(i)} + ${pb(i)} != ${pab(i)}")
    }
  }

  test("deterministic across evaluations; different seeds give different maps") {
    val v = Array.tabulate(64)(i => math.sin(i.toDouble).toFloat)
    val df = Seq(v).toDF("v")
    val p1 = df.select(F.randProject(col("v"), k, 42L)).collect()(0).getSeq[Float](0)
    val p2 = df.select(F.randProject(col("v"), k, 42L)).collect()(0).getSeq[Float](0)
    val p3 = df.select(F.randProject(col("v"), k, 43L)).collect()(0).getSeq[Float](0)
    assert(p1 == p2)
    assert(p1 != p3)
  }

  test("fixture audit: every label's mean squared norm ratio passes the JL gate") {
    val rows = graft.operators.VectorQueries.randProjectAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3),
        s"label ${r.getInt(0)}: mean_sq_ratio ${r.getDouble(2)} outside 1±0.2")
    }
  }

  test("SQL registration path") {
    graft.functions.GraftFunctions.install(spark)
    Seq(Array.fill(8)(1.0f)).toDF("v").createOrReplaceTempView("rp_in")
    val out = spark.sql("SELECT size(rand_project(v, 4, 9)) AS s FROM rp_in")
      .collect()(0).getInt(0)
    assert(out == 4)
  }
}
