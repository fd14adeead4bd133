package graft

/** Dev tool: time and/or explain individual declared queries.
  *
  * {{{
  * sbt "runMain graft.Probe /root/testdata/sf0.1 q5_local_supplier q_kpi_daily"
  * SPARK_GRAFT_EXPLAIN=1 sbt "runMain graft.Probe /root/testdata/sf0.1 q5_local_supplier"
  * }}}
  *
  * Prints every sample (2 warmup + 5 timed) per query so variance is
  * visible — the per-query medians in [[Bench]] are the committed
  * record; this is the iteration loop behind them.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Probe <sfDir> <queryName>...")
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = Tables.session()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
      val samples = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      val timed = samples.drop(2)
      println(f"[probe] $name%-28s median=${timed.sorted.apply(timed.size / 2)}%.3f  " +
        s"samples=${samples.map(s => f"$s%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
