package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew-mitigating join (SURVEY.md §4 "salting for skew"): when one
  * join key carries a disproportionate share of the fact rows, a plain
  * shuffle join sends that key's entire volume to ONE reducer — the
  * straggler that dominates job wall-clock at 100 TB. Salting splits
  * each fact key into `saltFactor` sub-keys (deterministic hash of the
  * row, NOT rand() — retries/speculative tasks must re-produce
  * identical rows) and replicates the small side once per salt, so the
  * hot key fans out over `saltFactor` reducers.
  *
  * AQE's skewedJoin optimization handles sort-merge skew adaptively at
  * runtime; explicit salting remains the tool for hash-partitioned
  * aggregations and for engines/paths AQE doesn't cover. Equivalence
  * with the unsalted join is property-tested in SaltedJoinSpec.
  */
object SaltedJoin {

  /** Inner-join `fact ⋈ dim` on `fact(factKey) = dim(dimKey)` with the
    * fact side salted `saltFactor` ways. `dim` is replicated
    * saltFactor× — keep it the small side. */
  def join(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
           saltFactor: Int, saltOn: Seq[Column]): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltOn: _*), lit(saltFactor.toLong)).cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
      salted(factKey) === replicated(dimKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
