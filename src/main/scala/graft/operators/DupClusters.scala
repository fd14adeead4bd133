package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING (SURVEY.md §2.11 E2 completion): the
  * dedup pipeline's final step. Pair detection (MinHash/LSH candidates
  * → exact jaccard verification) yields an EDGE LIST; what a training
  * pipeline actually needs is the partition of documents into
  * duplicate CLUSTERS with one canonical keeper each — a pair list
  * alone can't answer "which docs do I drop" when dups chain
  * (a~b, b~c but a≁c must still collapse to one keeper).
  *
  * Algorithm: min-label propagation to a fixpoint — every vertex
  * repeatedly adopts the smallest doc_id reachable through its
  * neighbors, converging in O(component diameter) rounds (near-dup
  * clusters are shallow; 2–4 rounds in practice). Each round is one
  * shuffle (join + groupBy-min); `localCheckpoint` truncates lineage
  * per round so plan depth stays constant, and the edge list is
  * cached once rather than re-derived from text each round.
  *
  * 100 TB posture: rounds ∝ diameter, not corpus size; each round
  * shuffles (vertex, label) longs only — never text. For adversarial
  * graphs (long chains) the alternating large-star/small-star variant
  * bounds rounds at O(log n) with the same per-round shape; the
  * convergence loop below is the same skeleton with a different
  * neighbor rule.
  */
object DupClusters {

  /** Rounds are O(log diameter) by pointer jumping; real dup graphs
    * converge in 2–4. The guard exists so that any future
    * nondeterminism in the label rule fails the gate fast with a
    * diagnosis instead of hanging the verify/bench run in an infinite
    * loop (label monotonicity guarantees convergence today). */
  private val MaxRounds = 64

  /** Shuffle-partition count for the label-propagation rounds, sized
    * from the symmetrized edge count: each shuffled row is ~24 B of
    * longs (id, comp[, old]), target ≤128 MB per partition, floor 4
    * (gate-scale graphs), cap 2^14. At 100 TB this makes the rounds
    * scale with |edges| instead of inheriting a session-wide constant
    * that is either too small (spill) or too large (task overhead). */
  private[graft] def partitionsForEdges(symEdges: Long): Int = {
    val target = math.ceil(symEdges.toDouble * 24 / (128L << 20)).toInt
    math.min(1 << 14, math.max(4, target))
  }

  /** Connected components of an undirected edge list (a, b) → rows
    * (id, comp) where comp = min doc_id of the component. */
  def components(edges: DataFrame, a: String, b: String): DataFrame = {
    val spark = edges.sparkSession
    // materialize the pair-detector output once (counting it must not
    // re-run detection) and size the loop's shuffles from it. Note the
    // checkpointed edge list is NOT pre-partitioned: LogicalRDD
    // reports UnknownPartitioning, so a pre-shuffle cannot be reused
    // by the per-round joins (verified on the physical plan) — and at
    // gate scale the small labels side auto-broadcasts, so the edge
    // side never shuffles anyway. At production |V| the per-round
    // label shuffle is the large-star/small-star trade-off already
    // described above.
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(edges.select(col(b).as("src"), col(a).as("dst")))
      .localCheckpoint()
    // AQE is OFF inside the loop: the plan shape is identical every
    // round and the shuffle width is already sized to the data here,
    // so AQE's per-stage re-planning round-trips (×~5 stages ×
    // O(log diameter) rounds) buy nothing and dominated the measured
    // round cost.
    graft.Tables.withConfs(spark,
      "spark.sql.shuffle.partitions" -> partitionsForEdges(sym.count()).toString,
      "spark.sql.adaptive.enabled" -> "false") {
      var labels = sym.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id"))
        .localCheckpoint()
      // Convergence test: labels only ever DECREASE (min is monotone),
      // so the fixpoint is reached exactly when sum(comp) stops
      // falling. Tracking the sum replaces the previous per-round
      // join-with-old-labels + filtered count — one fewer join in
      // every round's lineage, and the sum is a one-stage scan of the
      // just-checkpointed rows. No overflow: doc_ids and vertex counts
      // are far below 2^31, so the sum stays under 2^62.
      var prevSum = Long.MaxValue
      var converged = false
      var round = 0
      while (!converged) {
        round += 1
        if (round > MaxRounds)
          throw new IllegalStateException(
            s"DupClusters.components did not converge after $MaxRounds rounds — " +
              "label rule is no longer monotone")
        // phase 1 — neighbor min: every vertex adopts the smallest
        // label among itself and its neighbors
        val nbrMin = sym.join(labels, sym("src") === labels("id"))
          .select(col("dst").as("id"), col("comp"))
        val propagated = labels.unionByName(nbrMin)
          .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        // phase 2 — pointer jump: adopt the label OF the label (path
        // halving). Neighbor-min alone walks a chain one hop per
        // round (O(diameter) rounds); the jump contracts label chains
        // exponentially — O(log diameter) rounds, the contraction
        // behind large-star/small-star at 100 TB. One jump per round
        // measured best here: a second in-round jump saves fewer
        // rounds than its extra join stages cost.
        val jump = propagated
          .select(col("id").as("jid"), col("comp").as("jcomp"))
        // LAZY checkpoint: the convergence-sum action right below is
        // the round's only job — it materializes the checkpoint as a
        // side effect, so each round pays ONE action instead of an
        // eager-checkpoint job plus a sum job (measured ~25% off the
        // per-round wall time at gate scale).
        val next = propagated.join(jump, propagated("comp") === jump("jid"), "left")
          .select(propagated("id"),
            coalesce(col("jcomp"), propagated("comp")).as("comp"))
          .localCheckpoint(eager = false)
        val labelSum = // coalesce: sum over an empty vertex set is null
          next.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
        labels = next
        converged = labelSum == prevSum
        prevSum = labelSum
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          System.err.println(s"[cc] round done, sum=$labelSum t=${System.nanoTime()/1e9}")
      }
      labels
    }
  }

  private def clusterManifest(pairs: DataFrame): DataFrame =
    components(pairs, "a_id", "b_id")
      .groupBy(col("comp").as("keep_id"))
      .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
      .orderBy(col("keep_id"))

  /** Gate query: cluster the verified n-gram-jaccard near-dup pairs
    * and emit one row per cluster — keeper (min doc_id), member count,
    * max member — the drop-list manifest. */
  def nearDupClusters(spark: SparkSession, dir: String): DataFrame =
    clusterManifest(
      TextQueries.ngramJaccard(spark, dir).select(col("a_id"), col("b_id")))

  /** Embedding-side twin (E3 ∘ E2): clusters over the exact
    * cosine-similarity near-dup pairs — semantic dedup's drop-list,
    * same component machinery, different pair detector. */
  def cosineClusters(spark: SparkSession, dir: String): DataFrame =
    clusterManifest(
      VectorQueries.cosineDedup(spark, dir).select(col("a_id"), col("b_id")))
}
