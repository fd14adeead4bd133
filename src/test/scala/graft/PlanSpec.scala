package graft

import graft.operators.{KpiQueries, TpchQueries, VectorQueries}

/** Physical-plan assertions (SURVEY.md §4): the properties that keep
  * these operators viable at 100 TB — filter/column pushdown into the
  * parquet scan, broadcast joins for dimensions, TakeOrderedAndProject
  * for top-k, no accidental cartesian products — asserted against the
  * executed plan so a regression in plan shape fails CI, not a
  * cluster.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate filter + column pruning reach the parquet scan") {
    val p = plan(TpchQueries.q1PricingSummary(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter:\n$p")
    // projection pruned to the 7 used columns — partkey/suppkey/comment
    // must not be read
    assert(p.contains("ReadSchema") && !p.contains("l_partkey"), "column pruning lost")
  }

  test("resampleHourly: grid join broadcasts the hourly aggregate (r12)") {
    // a left-outer join can only build its RIGHT side: the r7 hint on
    // the preserved grid side was silently dropped (HintErrorLogger)
    // and the |hours|-row join ran as a two-sided shuffle+sort-merge
    val p = plan(KpiQueries.resampleHourly(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"grid fill must broadcast the hourly aggregate:\n$p")
    assert(!p.contains("SortMergeJoin"), s"grid fill fell back to SMJ:\n$p")
  }

  test("q3: dimension joins broadcast; no cartesian product") {
    val p = plan(TpchQueries.q3ShippingPriority(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q5: 6-way join keeps all dimensions broadcast") {
    val p = plan(TpchQueries.q5LocalSupplier(spark, sf))
    assert(p.split("BroadcastHashJoin").length >= 4,
      s"expected >=4 broadcast joins (supplier/customer/nation/region):\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("topk: TakeOrderedAndProject, not a total sort") {
    val p = plan(TpchQueries.topkOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"top-k should not total-sort:\n$p")
  }

  test("kpiDaily: partial aggregation before the shuffle") {
    val p = plan(KpiQueries.kpiDaily(spark, sf))
    assert(p.contains("HashAggregate"), p)
    // partial + final pair: at least two HashAggregate nodes
    assert(p.split("HashAggregate").length >= 3, s"no map-side partial agg:\n$p")
  }

  test("knnBrute: corpus side is not shuffled (broadcast 1-row query)") {
    val p = plan(VectorQueries.knnBrute(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query vector should broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("annIvf: centroid assignment is map-side — no shuffle exchange in the plan") {
    // r1 regression guard (VERDICT finding #1): the corpus×nlist expand
    // + per-vec_id row_number window shuffled 16× the corpus. The
    // nearest_centroid formulation broadcasts the centroid list; the
    // only exchanges allowed anywhere in the plan are broadcasts.
    val p = plan(VectorQueries.annIvf(spark, sf))
    assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"),
      s"corpus must not shuffle for IVF assignment:\n$p")
    assert(p.contains("nearest_centroid"), s"native assignment kernel missing:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("semDedup candidates: map-side soft assignment; the only shuffles are the list self-join and survivor distinct") {
    val p = plan(VectorQueries.semDedupCandidates(spark, sf, 3))
    // assignment is broadcast + fused top-k kernel — no corpus
    // shuffle before the list_id block join
    assert(p.contains("nearest_centroids"), s"native top-k assignment kernel missing:\n$p")
    // every hashpartitioning exchange is either the within-list block
    // join (key list_id — the index-build shuffle that deliberately
    // carries vectors, see the in-body layout note) or the
    // result-sized survivor distinct (a_id, b_id, cos — no vectors)
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty, s"expected the block-join exchange:\n$p")
    val stray = exchanges.filterNot(l =>
      l.contains("list_id#") || (l.contains("a_id#") && !l.contains("av#")))
    assert(stray.isEmpty, s"unexpected exchange:\n${stray.mkString("\n")}")
  }

  test("annLsh: vectors never ride an exchange; candidate fetch is broadcast") {
    val p = plan(VectorQueries.annLsh(spark, sf))
    // every join must be broadcast — a sort-merge/shuffled-hash join
    // would shuffle the vector payload
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast candidate fetch:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"vector-carrying shuffle join:\n$p")
    // the only shuffles are the candidate distincts, whose partition
    // keys ARE their full output — assert they carry (table, bucket,
    // vec_id) longs, never the embedding/query-vector columns
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty, s"expected the candidate distinct exchange:\n$p")
    assert(!exchanges.exists(l => l.contains("embedding") || l.contains("qv#")
        || l.contains(" v#")),
      s"vector column rides a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("knnBatchAgg: top_k runs as partial+final ObjectHashAggregate") {
    // SortAggregate would sort every scored row before aggregating —
    // exactly the cost the bounded top-k buffer exists to avoid; and
    // without a partial (map-side) instance the shuffle carries all
    // scored rows, not ≤k per query per partition.
    val p = plan(VectorQueries.knnBatchAgg(spark, sf))
    assert(p.contains("ObjectHashAggregate"), s"top_k fell off the hash-agg path:\n$p")
    assert(p.split("ObjectHashAggregate").length >= 3,
      s"no map-side partial top_k:\n$p")
    assert(!p.contains("SortAggregate"), s"top_k degraded to sort-agg:\n$p")
  }

  test("vocabTopk: global cut is TakeOrderedAndProject, no total sort") {
    val p = plan(graft.operators.TextQueries.vocabTopk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"vocab cut should be top-k:\n$p")
  }

  test("bpePairs: pair explode runs at VOCAB grain (agg below it), cut is top-k") {
    val p = plan(graft.operators.TextQueries.bpePairs(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"pair cut should be top-k:\n$p")
    // two Generates: word explode (bottom), pair explode (top) — the
    // word-frequency HashAggregate must sit BETWEEN them, proving the
    // quadratic pair enumeration runs on distinct words, not tokens
    val parts = p.split("Generate ")
    assert(parts.length >= 3, s"expected token+pair explodes:\n$p")
    assert(parts(1).contains("HashAggregate"),
      s"pair explode is not above the vocab aggregate:\n$p")
  }

  test("prunedKpis: day filter lands on the date PARTITION column (S6)") {
    // the Spark restatement of the reference's S3 prefix prune
    // (daily_kpis.py:155-156): non-empty PartitionFilters on the scan,
    // NOT a row filter over a full-zone read
    val zone = graft.operators.PipelineQueries.writePartitionedZone(spark, sf)
    val df = graft.batch.DailyKpis.compute(spark, zone,
      day = Some(graft.operators.PipelineQueries.PruneDay))
    val p = plan(df)
    assert(p.contains("PartitionFilters: ["), s"no PartitionFilters section:\n$p")
    val pf = p.split("PartitionFilters: \\[", 2)(1).split("\\]", 2)(0)
    assert(pf.contains("date"), s"empty/irrelevant PartitionFilters [$pf]:\n$p")
    // and the one-day scan answers exactly one KPI row for that day
    val rows = df.collect()
    assert(rows.length === 1 &&
      rows.head.getAs[String]("dt") === graft.operators.PipelineQueries.PruneDay)
  }

  test("windowRunningSum: one exchange (window key), no global sort above the window") {
    // the presentation ORDER BY was dropped (r4): the plan must be
    // Exchange(suppkey) → Sort(within partitions) → Window — not a
    // second range exchange + total sort for output order no consumer
    // needs on a full-fact result
    val p = plan(TpchQueries.windowRunningSum(spark, sf))
    assert(p.split("Exchange").length - 1 === 1,
      s"expected exactly one exchange (the window hash partitioning):\n$p")
    assert(!p.contains("rangepartitioning"),
      s"global output sort crept back in:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("sketchRollup: both sketch levels run as partial+final ObjectHashAggregate") {
    // the sketch-table pattern's scale contract: level-1 sketches are
    // built map-side (partial ObjectHashAggregate before the shuffle),
    // so the exchange carries |groups| sketches, never raw rows; the
    // level-2 fold is again partial+final over the stored sketches
    val p = plan(KpiQueries.sketchRollup(spark, sf))
    assert(p.split("ObjectHashAggregate").length - 1 >= 4,
      s"expected 2 levels x (partial+final) ObjectHashAggregate:\n$p")
  }

  test("approxNdvStats: one pass, no Expand (the 100TB stats path, r8)") {
    val p = plan(TpchQueries.approxNdvStats(spark, sf))
    // the exact count_distinct x4 plan duplicates every input row 4x
    // through an Expand; the HLL swap must plan without one
    assert(!p.contains("Expand"), s"Expand crept into the approx ndv plan:\n$p")
    // all four sketches ride one ObjectHashAggregate pair (partial+final)
    assert(p.split("ObjectHashAggregate").length - 1 >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
  }

  test("quantileRollup: sketch aggs on the ObjectHashAggregate path, no sort") {
    val p = plan(TpchQueries.quantileRollup(spark, sf))
    assert(p.split("ObjectHashAggregate").length - 1 >= 4,
      s"expected 2 levels x (partial+final) ObjectHashAggregate:\n$p")
    // quantiles come from the folded sketch, never from sorting data
    // rows: the only Sort allowed is the |returnflag|-row presentation
    // sort ABOVE the final aggregate (no Sort below any aggregate)
    val firstAgg = p.indexOf("ObjectHashAggregate")
    assert(!p.substring(firstAgg).contains("+- Sort"),
      s"row sort crept in below the sketch aggregation:\n$p")
  }

  test("windowFirstLast: the three frame functions share one exchange + sort") {
    val p = plan(TpchQueries.windowFirstLast(spark, sf))
    // one hash exchange for the window key; the final presentation
    // order adds one range exchange — but never a third
    assert(p.contains("hashpartitioning(o_custkey"), p)
    assert(p.split("\\bWindow\\b").length - 1 <= 2,
      s"window functions did not share a physical Window node:\n$p")
  }

  test("invertedIndex: partial aggregation precedes the term shuffle") {
    val p = plan(graft.operators.TextQueries.invertedIndex(spark, sf))
    assert(p.contains("ObjectHashAggregate") || p.split("HashAggregate").length >= 3,
      s"no partial agg before the term exchange:\n$p")
  }

  test("funnel: the three chained stage windows share one hash exchange") {
    val p = plan(KpiQueries.funnel(spark, sf))
    // stages re-sort within partitions but must NOT re-shuffle: exactly
    // one exchange on (user_id, dt) below the windows (the final agg +
    // presentation sort add their own exchanges above)
    val winPart = "hashpartitioning(user_id"
    assert(p.split(java.util.regex.Pattern.quote(winPart)).length - 1 <= 1,
      s"each funnel stage re-shuffled on the window key:\n$p")
    assert(p.split("\\bWindow\\b").length - 1 >= 1, p)
  }

  test("retentionCohorts: one data-sized exchange, no join") {
    val p = plan(KpiQueries.retentionCohorts(spark, sf))
    assert(!p.contains("Join"), s"cohort triangle must not join:\n$p")
    // exchanges: user_id (data-sized) + (cohort, day_k) rollup +
    // presentation sort — the first is the only one carrying raw rows
    assert(p.contains("hashpartitioning(user_id"), p)
  }

  test("media synthesis: pure column projection, no object round-trip") {
    // r4: synthesize is a native-expression projection; a typed
    // Dataset.map would show DeserializeToObject/MapElements/
    // SerializeFromObject nodes and break whole-stage codegen
    val p = plan(graft.operators.MultimodalQueries.mediaStats(spark, sf))
    assert(!p.contains("MapElements") && !p.contains("DeserializeToObject"),
      s"row-at-a-time synthesis is back:\n$p")
    assert(p.contains("payload_bytes"), s"native payload kernel missing:\n$p")
  }

  test("woeIv: one data-sized aggregation, broadcast-only joins, pruned scan (r9)") {
    val p = plan(graft.operators.ExperimentQueries.woeIv(spark, sf))
    // the only joins are the broadcast 1-row total and iv folds —
    // a SortMergeJoin would mean a data-sized shuffle snuck in
    assert(!p.contains("SortMergeJoin"), s"data-sized join in WOE/IV:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"totals not broadcast:\n$p")
    // fixed cuts ⇒ no window sort anywhere (the ntile formulation
    // this operator deliberately avoids would plan a global Window)
    assert(!p.contains("Window"), s"global window in WOE/IV:\n$p")
    // scan pruned to the two consumed columns
    assert(!p.contains("doc_id") && !p.contains("[text"),
      s"column pruning lost:\n$p")
  }

  test("triangleAudit: no cartesian product; wedge join is an equi-join (r9)") {
    val p = plan(graft.operators.ClickstreamGraph.triangleAudit(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in triangle count:\n$p")
    // wedge build + closing are hash equi-joins on (src) / (v, w) —
    // the inequality v < w must ride as a post-join filter, never a
    // nested-loop join condition over non-equi keys. The ONLY
    // nested-loop joins allowed are the two 1-row stat combiners at
    // the top (edges × wedges × triangles); a third means the wedge
    // close degenerated (the r10 tightening — the r9 form of this
    // assertion was satisfied by ANY hash join anywhere in the plan,
    // so it could never fail).
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 2, s"wedge join degenerated to nested loop ($bnlj BNLJ):\n$p")
    // and the wedge-close equi-join actually exists as a hash join
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"),
      s"no hash equi-join in triangle plan:\n$p")
  }

  test("q_dsv2_daily: grouped aggregate completely pushed — no Aggregate, no event rows") {
    val df = graft.operators.PipelineQueries.dsv2Daily(spark, sf)
    val p = plan(df)
    // complete pushdown: Spark plans NO aggregate at all — the scan
    // emits one closed-form row per day; the only Exchange permitted
    // is the ORDER BY's final sort over ≤ days rows
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate") &&
      !p.contains("ObjectHashAggregate"),
      s"aggregate not pushed into the connector:\n$p")
    assert(p.contains("PushedAggregates"), s"agg scan missing:\n$p")
    // and the pushed answer matches the row-level computation. The
    // control disables pushdown with a semantically-identity event_ts
    // filter: any pushed filter makes the builder refuse aggregates
    // (the closed forms would ignore residual filters), and the
    // connector re-hands filters to Spark, so the Filter node keeps
    // the Aggregate from reaching the scan.
    import org.apache.spark.sql.functions._
    val raw = spark.read.format("graft-events")
      .option("n", 50000L).option("days", 7).load()
      .where(col("event_ts") >= "2025-01-01")
      .select(col("_day"), col("event_ts"))
      .groupBy(col("_day"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_ts")).as("min_ts"),
        max(col("event_ts")).as("max_ts"))
      .select(col("_day").cast("int").as("day"), col("n_events"),
        col("min_ts"), col("max_ts"))
      .orderBy(col("day"))
    assert(plan(raw).contains("Aggregate"),
      "control plan unexpectedly pushed — the comparison is vacuous")
    assert(df.collect().map(_.toString).toSeq ===
      raw.collect().map(_.toString).toSeq)
  }

  test("whole-stage codegen covers the q1 aggregation pipeline") {
    // AQE shows codegen stages only in the final (executed) plan
    val df = TpchQueries.q1PricingSummary(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // executed-plan toString marks codegen stages with "*(n)"
    assert(p.contains("*("), s"codegen disabled?:\n$p")
  }
}
