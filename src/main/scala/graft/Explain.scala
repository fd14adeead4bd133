package graft

/** Dev tool: print the formatted physical plan of one or more declared
  * queries (`runMain graft.Explain q_name [q_name2 ...]`) against
  * SPARK_GRAFT_SF_DIR — the `.explain("formatted")` feedback loop for
  * plan-shape iteration (pushdown, exchanges, codegen spans) without
  * writing a throwaway spec.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Tables.session()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      df.explain("formatted")
    }
    spark.stop()
  }
}
