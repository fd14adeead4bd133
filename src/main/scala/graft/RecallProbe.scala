package graft

/** Throwaway dev probe (not part of the engine surface): measures
  * SemDeDup recall at each SF for several probe counts.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); p <- Seq(3, 5, 8)) {
      val dir = s"/root/testdata/$sf"
      val t0 = System.nanoTime()
      val (_, r) = graft.operators.VectorQueries.semDedupFound(spark, dir, probes = p)
      println(f"[recall] $sf probes=$p recall=$r%.3f time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
  }
}
