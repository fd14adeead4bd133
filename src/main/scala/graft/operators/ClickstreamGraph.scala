package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/** Clickstream graph/behavior wave: PageRank over the event-transition
  * graph, session entry/bounce anatomy, per-event dwell time, and
  * event co-occurrence lift. Extends the reference's KPI domain
  * (daily_kpis.py:1-60 computes flat per-day counts) with the
  * graph-shaped analytics a clickstream warehouse grows into.
  *
  * The recurring scale argument: every iterative or pairwise step here
  * runs at POST-AGGREGATION grain — the transition graph is
  * |event vocabulary|² rows and the per-user distinct-type set is
  * vocabulary-bounded — so the only data-sized passes are the initial
  * per-user window / groupBy, each a single exchange on user_id.
  */
object ClickstreamGraph {
  import graft.Tables.load

  private def et(c: String = "event_type") = lower(coalesce(col(c), lit("")))

  /** Per-user time-ordered event stream with the shared window the
    * whole wave sessionizes over (ts with event_id tiebreak — the
    * fixture carries equal timestamps). */
  private def stream(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), et().as("et"))

  private val userW = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  /** PageRank over the event-type transition graph — 3 unrolled power
    * iterations, damping 0.85. The graph AGGREGATES first: one
    * user-grain window pass emits (src, dst) successor pairs, a count
    * rollup collapses them to |vocab|² weighted edges, and every
    * iteration is then a broadcast join between the |vocab|-row rank
    * vector and the |vocab|²-row normalized edge list — no iteration
    * ever touches raw events again. That is the 100 TB shape: the
    * expensive pass happens once, the fixpoint loop runs on the
    * aggregate (for page-grain graphs, |vocab| ~ 1e6 nodes still
    * broadcasts). Dangling-mass convention: contributions flow only
    * along observed edges (the classic simplified formulation), so the
    * result is a deterministic rational function of the edge counts.
    * Node count stays in-plan via a broadcast 1-row cross join — zero
    * driver actions. */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val d = 0.85
    val edges = stream(spark, dir)
      .withColumn("dst", lead(col("et"), 1).over(userW))
      .where(col("dst").isNotNull)
      .withColumnRenamed("et", "src")
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val outW = edges.groupBy(col("src")).agg(sum(col("n")).as("out_n"))
    val norm = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("n") / col("out_n")).as("w"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct()
      .crossJoin(broadcast(
        edges.select(col("src")).union(edges.select(col("dst")))
          .distinct().agg(count(lit(1)).as("n_nodes"))))
    var ranks = nodes.select(col("node"), col("n_nodes"),
      (lit(1.0) / col("n_nodes")).as("pr"))
    for (_ <- 1 to 3) {
      // both join sides are vocab-grain aggregates: broadcast explicitly
      // (post-agg stats are unknown pre-AQE, so Catalyst would otherwise
      // plan a sort-merge join for the outer step)
      val contrib = ranks.join(broadcast(norm), ranks("node") === norm("src"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") * col("w")).as("c"))
      ranks = nodes.join(broadcast(contrib), nodes("node") === contrib("dst"), "left")
        .select(nodes("node"), nodes("n_nodes"),
          ((lit(1.0) - d) / col("n_nodes") + lit(d) * coalesce(col("c"), lit(0.0))).as("pr"))
    }
    ranks.select(col("node"), F.roundBin(col("pr"), 6).as("pr")).orderBy(col("node"))
  }

  /** Session entry anatomy: per entry event type, how many sessions
    * start there and what fraction bounce (single-event sessions) —
    * the landing-page report every clickstream product ships. One
    * user-grain exchange carries the whole computation: the session
    * id (running sum of gap breaks), the per-user row number, and the
    * session rollup all ride the same (user_id | ts, event_id) sort;
    * the final entry-type rollup is vocabulary-sized. Gap convention
    * matches [[KpiQueries.sessionize]]: strictly > 1800 s splits. */
  def bounceRate(spark: SparkSession, dir: String): DataFrame = {
    val ev = stream(spark, dir)
      .withColumn("rn", row_number().over(userW))
      .withColumn("prev_ts", lag(col("ts"), 1).over(userW))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("sess",
        sum(col("new_sess")).over(userW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ev.groupBy(col("user_id"), col("sess"))
      .agg(min_by(col("et"), col("rn")).as("entry_et"), count(lit(1)).as("n_ev"))
      .groupBy(col("entry_et"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .select(col("entry_et"), col("n_sessions"), col("n_bounce"),
        F.roundBin(col("n_bounce") / col("n_sessions"), 6).as("bounce_rate"))
      .orderBy(col("entry_et"))
  }

  /** Per-event-type dwell time — seconds until the user's next event,
    * counted only within a session (gap ≤ 1800 s; a longer gap is a
    * session break, not dwell). Uses the identity "next event in the
    * same session ⟺ gap ≤ threshold", so no session ids are needed:
    * one lead() on the shared user window, then a vocabulary-sized
    * rollup. Map-side partial aggregation means the wire carries
    * |vocab| partial rows per partition regardless of data size. */
  def dwellTime(spark: SparkSession, dir: String): DataFrame = {
    stream(spark, dir)
      .withColumn("dwell",
        lead(col("ts"), 1).over(userW).cast("long") - col("ts").cast("long"))
      .where(col("dwell").isNotNull && col("dwell") <= 1800L)
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n"),
        F.roundBin(avg(col("dwell")), 4).as("avg_dwell_s"))
      .orderBy(col("et"))
  }

  /** Event-type co-occurrence with lift — which behaviors show up in
    * the same user's history more than independence predicts (the
    * association core of market-basket / audience-overlap analysis).
    * The user×type incidence is DISTINCT first (≤ |users|·|vocab|
    * rows), so the self-join explodes at most C(|vocab|,2) pairs per
    * user — bounded by the vocabulary, not event volume; the join key
    * is user_id so both sides share one hash exchange. Lift =
    * P(a,b)/(P(a)·P(b)) over the user population; the population size
    * rides a broadcast 1-row cross join (no driver action). */
  def cooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val ue = stream(spark, dir).select(col("user_id"), col("et")).distinct()
    val totals = ue.groupBy(col("et")).agg(count(lit(1)).as("n_et"))
    val pairs = ue.as("a")
      .join(ue.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.et") < col("b.et"))
      .groupBy(col("a.et").as("et_a"), col("b.et").as("et_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(totals.withColumnRenamed("et", "et_a").withColumnRenamed("n_et", "n_a")), "et_a")
      .join(broadcast(totals.withColumnRenamed("et", "et_b").withColumnRenamed("n_et", "n_b")), "et_b")
      .crossJoin(broadcast(ue.select(col("user_id")).distinct().agg(count(lit(1)).as("n_users"))))
      .select(col("et_a"), col("et_b"), col("n_both"), col("n_a"), col("n_b"),
        F.roundBin(col("n_both") * col("n_users") / (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("et_a"), col("et_b"))
  }

  /** Cohort lifetime/churn summary — per signup cohort: user count,
    * average observed lifetime (last minus first active day), and the
    * week-one churn count (users never seen after day 6). The
    * LTV-report complement to [[KpiQueries.retentionCohorts]]'s
    * activity triangle: retention answers "who came back on day k",
    * this answers "how long do they stay at all". Two-level rollup —
    * user-grain min/max/count (one data-sized exchange, map-side
    * combined), then a calendar-bounded cohort aggregate. */
  def userLifetime(spark: SparkSession, dir: String): DataFrame = {
    val per = load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min(to_date(col("ts"))).as("first_day"),
        max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("n_ev"))
      .withColumn("lifetime_days", datediff(col("last_day"), col("first_day")))
    per.groupBy(date_format(col("first_day"), "yyyy-MM-dd").as("cohort"))
      .agg(
        count(lit(1)).as("n_users"),
        F.roundBin(avg(col("lifetime_days")), 4).as("avg_lifetime_days"),
        sum(when(col("lifetime_days") < 7, 1L).otherwise(0L)).as("n_week1_churn"),
        F.roundBin(avg(col("n_ev")), 4).as("avg_events_per_user"))
      .orderBy(col("cohort"))
  }

  /** Triangle count + global transitivity of the near-dup pair graph
    * (r9) — the clique-ness audit behind [[DupClusters]]'s
    * canonicalization: connected-component clustering merges by
    * TRANSITIVE closure, so a similarity graph whose transitivity is
    * low is exactly the one where closure over-merges (chains of
    * borderline pairs welding unrelated docs into one cluster). One
    * number a dedup pipeline checks before trusting cluster-level
    * canonical reps.
    *
    * Distributed formulation — the degree-ordered wedge-closing
    * algorithm (Suri & Vassilvitskii, WWW'11): orient every edge from
    * its lower-(degree, id) endpoint to the higher one, build wedges
    * only at each vertex's OUT-neighbors (every vertex has out-degree
    * O(√|E|) under this orientation, so wedge count is O(|E|^1.5)
    * worst-case instead of Σ deg² — the hub that breaks the naive
    * formulation generates no wedges at all), and close each wedge
    * with one semi-join back to the edge list; each triangle is
    * counted exactly once at its lowest-ordered vertex. Transitivity
    * = 3·triangles / wedges uses the UNDIRECTED wedge count
    * Σ deg·(deg−1)/2 (each triangle contains 3 of them).
    *
    * At 100 TB the edge manifest is the near-dup funnel's output
    * (pair-count bounded, never corpus²) and all three stages shuffle
    * only id pairs; the oracle recomputes via the definitional 3-way
    * join. */
  def triangleAudit(spark: SparkSession, dir: String): DataFrame = {
    // the memoized manifest is a LocalRelation — consumed 4×
    // (degrees, orientation, closing) with no recomputation
    val edges = DupClusters.pairManifest(spark, dir)
    val deg = edges.select(col("a_id").as("id"))
      .unionAll(edges.select(col("b_id").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient low-(deg, id) → high-(deg, id)
    val withDeg = edges
      .join(deg.select(col("id").as("a_id"), col("deg").as("da")), Seq("a_id"))
      .join(deg.select(col("id").as("b_id"), col("deg").as("db")), Seq("b_id"))
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a_id") < col("b_id")),
        struct(col("a_id").as("src"), col("b_id").as("dst")))
        .otherwise(struct(col("b_id").as("src"), col("a_id").as("dst")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // wedges at the lowest-ordered vertex: pairs of out-neighbors
    val wedges = oriented.select(col("src"), col("dst").as("v"))
      .join(oriented.select(col("src"), col("dst").as("w")), Seq("src"))
      .where(col("v") < col("w"))
      .select(col("v"), col("w"))
    // close against the UNDIRECTED edge set (v < w matches a_id < b_id)
    val tri = wedges.join(
      edges.select(col("a_id").as("v"), col("b_id").as("w")), Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = edges.agg(count(lit(1)).as("n_edges"))
    val openWedges = deg.agg(
      sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_wedges"))
    stats.crossJoin(broadcast(openWedges)).crossJoin(broadcast(tri))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        F.roundBin(
          when(col("n_wedges") > 0,
            col("n_triangles") * lit(3.0) / col("n_wedges"))
            .otherwise(lit(0.0)), 6).as("transitivity"))
  }
}
