package graft

/** Ad-hoc profiling entry: time named queries with repeats in one warm
  * session; optionally print the formatted plan.
  * Usage: runMain graft.Prof <sfDir> <reps> <name...>
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = Tables.session()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.contains("PROF_EXPLAIN")) fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        // full evaluation, same as Bench (count() lets Catalyst prune)
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        println(f"[prof] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
