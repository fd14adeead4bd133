package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating join (SURVEY.md §4 "salting for skew"): when one
  * join key carries a disproportionate share of the fact rows, a plain
  * shuffle join sends that key's entire volume to ONE reducer — the
  * straggler that dominates job wall-clock at 100 TB.
  *
  * This is HOT-KEY-ONLY salting, two logical passes over the fact:
  *
  *  1. Frequency pass: aggregate fact-row counts per key (map-side
  *     partial agg collapses even a hot key to ≤ one row per input
  *     partition, so this pass is itself skew-immune) and keep keys
  *     with ≥ `hotKeyThreshold` rows. By construction that set has at
  *     most |fact| / hotKeyThreshold keys — small enough to broadcast.
  *  2. Join pass (single fact scan): the hot-key set — driver-side
  *     values, since it is broadcast-sized by construction — becomes a
  *     scalar `isin` predicate (Catalyst plans it as a hashed InSet
  *     past 10 values), NOT a join: the salt decision is a codegen'd
  *     per-row filter that adds zero exchanges to the plan. Hot fact
  *     rows get a deterministic salt in [0, saltFactor) (hash of the
  *     row, NOT rand() — retries and speculative tasks must reproduce
  *     identical rows); cold rows get salt 0. Dim rows are replicated
  *     saltFactor× ONLY for hot keys; cold dim rows pass through once.
  *     One equi-join on (key, salt) then does the work: each hot key
  *     fans out over saltFactor reducers, everything else joins
  *     exactly as the plain join would.
  *
  * With no key above threshold (uniform data) the join IS the plain
  * shuffle join — the empty hot set short-circuits every salting
  * node out of the plan, so skew insurance costs nothing when there
  * is no skew. AQE's skewedJoin handles sort-merge skew
  * adaptively at runtime; explicit salting remains the tool for
  * hash-partitioned aggregations and paths AQE doesn't cover.
  * Equivalence with the unsalted join (skewed and uniform fixtures) is
  * property-tested in SaltedJoinSpec.
  */
object SaltedJoin {

  /** Inner-join `fact ⋈ dim` on `fact(factKey) = dim(dimKey)`, salting
    * only keys with ≥ `hotKeyThreshold` fact rows `saltFactor` ways.
    * Dim rows are replicated saltFactor× only for those hot keys —
    * keep `dim` the smaller side.
    *
    * `sampleFraction < 1` runs the frequency pass on a seeded sample
    * with the threshold scaled to match — at production thresholds
    * (millions of rows per hot key) a 1-5% sample finds every hot key
    * with near-certainty at 1/20 the pass cost; sampling noise can
    * only change WHICH borderline keys get salted, never the join
    * result. Keep 1.0 when the threshold is small (tests). */
  /** The frequency/stats pass alone: keys with ≥ `hotKeyThreshold`
    * fact rows (single column named `__hot_key`). Exposed separately
    * because hot-key stats belong with TABLE statistics, not per-query
    * work — production refreshes them per table-stats cycle (the
    * ANALYZE-TABLE discipline) and reuses them across every join on
    * that fact; callers pass the collected values via
    * `join(hotKeyValues = ...)`. */
  def hotKeys(fact: DataFrame, factKey: String,
              hotKeyThreshold: Long = 1000000L,
              sampleFraction: Double = 1.0): DataFrame = {
    val (freqSrc, freqThreshold) =
      if (sampleFraction >= 1.0) (fact, hotKeyThreshold)
      else (fact.sample(withReplacement = false, sampleFraction, seed = 42L),
        math.max(1L, math.round(hotKeyThreshold * sampleFraction)))
    freqSrc.groupBy(col(factKey)).agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") >= freqThreshold)
      .select(col(factKey).as("__hot_key"))
  }

  def join(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
           saltFactor: Int, saltOn: Seq[Column],
           hotKeyThreshold: Long = 1000000L,
           sampleFraction: Double = 1.0,
           hotKeyValues: Option[Seq[Any]] = None): DataFrame = {
    val hot: Seq[Any] = hotKeyValues.getOrElse(
      hotKeys(fact, factKey, hotKeyThreshold, sampleFraction)
        .collect().map(_.get(0)).toSeq)
    if (hot.isEmpty) {
      // no skew ⇒ the plain join, with zero salting residue in the plan
      fact.join(dim, fact(factKey) === dim(dimKey))
    } else {
      val salted = fact.withColumn("__salt",
        when(col(factKey).isin(hot: _*),
          pmod(xxhash64(saltOn: _*), lit(saltFactor.toLong)).cast("int"))
          .otherwise(lit(0)))
      val replicated = dim.withColumn("__salt",
        explode(when(col(dimKey).isin(hot: _*),
          sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      salted.join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("__salt") === replicated("__salt"))
        .drop("__salt")
    }
  }
}
