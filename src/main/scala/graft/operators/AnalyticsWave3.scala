package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/** Third-wave analytics operators: the ranking-window family, exact
  * group percentiles, bitmap-based exact distinct (the 100 TB exact
  * alternative to HLL), time-series linear interpolation, last-touch
  * attribution, vocabulary OOV rate, and an equi-depth histogram.
  *
  * Scale notes follow each query; the recurring theme is that every
  * rank/interpolation window here is either partitioned by a data key
  * (user, priority) or runs at POST-AGGREGATION grain (hours,
  * buckets) where cardinality is bounded by time, not data volume.
  */
object AnalyticsWave3 {
  import graft.Tables.load

  /** Ranking-window family over orders: dense_rank / percent_rank /
    * cume_dist / ntile(4) sharing ONE window definition → one
    * Exchange + Sort for all four. The order key (rounded totalprice
    * desc, orderkey) is total, so every rank — ntile included — is
    * engine-deterministic. Partitioned by o_orderpriority: parallel
    * across groups, no global sort. */
  def windowRanks(spark: SparkSession, dir: String): DataFrame = {
    val ord = load(spark, dir, "orders")
      .withColumn("price", F.roundBin(col("o_totalprice"), 2))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price").desc, col("o_orderkey"))
    ord.select(col("o_orderkey"), col("o_orderpriority"), col("price"),
        dense_rank().over(w).as("dr"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("o_orderpriority"), col("dr"), col("o_orderkey"))
  }

  /** Exact per-group quartiles via the linear-interpolating
    * `percentile` aggregate (TypedImperativeAggregate; partial+final
    * merge of per-partition digests — one shuffle at group grain).
    * For unbounded-cardinality inputs at 100 TB the sketch path is
    * q_quantile_rollup; this is the exact small-group complement. */
  def medianGroups(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("qs"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        F.roundBin(col("qs").getItem(0), 4).as("q1"),
        F.roundBin(col("qs").getItem(1), 4).as("median"),
        F.roundBin(col("qs").getItem(2), 4).as("q3"),
        col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** EXACT daily distinct users via two-level bitmap aggregation —
    * the scale pattern for exact COUNT(DISTINCT) over dense integer
    * keys: level 1 groups by (day, bitmap bucket) building one RLE
    * bitmap per 32k-id bucket (map-side combined, each bitmap ≤4 KB);
    * level 2 sums per-bucket cardinalities. No row-level distinct
    * shuffle ever happens — the wire carries bitmaps, not ids. Exact
    * where HLL (q_approx_distinct) is approximate; the same shape
    * incrementally maintains a per-day bitmap table (cf.
    * q_sketch_rollup for the HLL analogue). */
  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("dt"), col("user_id"))
    ev.groupBy(col("dt"), expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .groupBy(col("dt"))
      .agg(sum(expr("bitmap_count(bm)")).cast("long").as("unique_users"))
      .orderBy(col("dt"))
  }

  /** Linear interpolation of hourly purchase value onto the full hour
    * grid: forward anchor (last non-null before) and backward anchor
    * (first non-null after) share one tiny window over the
    * POST-AGGREGATION hour grain (≤ 8.8k rows/year at 100 TB — the
    * single-partition window is bounded by the calendar, not data).
    * Missing edges fall back to ffill/bfill. */
  def interpolate(spark: SparkSession, dir: String): DataFrame = {
    val known = load(spark, dir, "events")
      .where(lower(coalesce(col("event_type"), lit(""))) === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(avg(col("value")).as("v"))
    val grid = spark.range(1)
      .select(explode(expr(
        "sequence(timestamp'2024-01-01 00:00:00', timestamp'2024-01-30 23:00:00', interval 1 hour)"))
        .as("hr"))
    val g = grid.join(known, Seq("hr"), "left_outer")
    val wPrev = Window.orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy(col("hr"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevV = last(col("v"), ignoreNulls = true).over(wPrev)
    val prevH = last(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wPrev)
    val nextV = first(col("v"), ignoreNulls = true).over(wNext)
    val nextH = first(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wNext)
    val frac = (col("hr").cast("long") - col("ph").cast("long")) /
      (col("nh").cast("long") - col("ph").cast("long"))
    g.select(col("hr"), col("v"),
        prevV.as("pv"), prevH.as("ph"), nextV.as("nv"), nextH.as("nh"))
      .select(date_format(col("hr"), "yyyy-MM-dd HH:00").as("hour"),
        F.roundBin(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) * frac)
            .otherwise(coalesce(col("pv"), col("nv"))), 4).as("value_interp"))
      .orderBy(col("hour"))
  }

  /** Last-touch attribution: each purchase credits the most recent
    * prior view/click touch of the same user ("direct" if none). The
    * IGNORE NULLS running-last over a [-∞, -1] frame shares the
    * (user)(ts, event_id) exchange with nothing else — one window
    * pass, then a day×channel-grain rollup. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val et = lower(coalesce(col("event_type"), lit("")))
    val ev = load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"), et.as("et"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("touch",
        last(when(col("et").isin("view", "click"), col("et")), ignoreNulls = true).over(w))
      .where(col("et") === "purchase")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"),
        coalesce(col("touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("purchases"),
        F.roundBin(sum(coalesce(col("value"), lit(0.0))), 2).as("revenue"))
      .orderBy(col("dt"), col("channel"))
  }

  /** Out-of-vocabulary rate per source against the global top-1000
    * token vocabulary. Vocabulary cut is (count desc, token) — total
    * order → deterministic boundary — via TakeOrderedAndProject;
    * the vocab (bounded at 1000 BY CONSTRUCTION) broadcasts back onto
    * the token stream, so the only data-sized shuffles are the two
    * token-grain aggregations (both map-side combined). */
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    val toks = load(spark, dir, "documents")
      .select(col("source"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(1000)
      .select(col("tok").as("vtok"))
    toks.join(broadcast(vocab), col("tok") === col("vtok"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        count(col("vtok")).as("in_vocab"))
      .select(col("source"), col("n_tokens"),
        F.roundBin(lit(1.0) - col("in_vocab") / col("n_tokens"), 6).as("oov_rate"))
      .orderBy(col("source"))
  }

  /** Robust outlier audit per group: MAD (median absolute deviation)
    * fences — the outlier detector that survives the outliers it
    * hunts, unlike stddev z-scores. Two exact interpolating-median
    * passes (group medians broadcast back between them; both
    * aggregations are at group grain). Exact medians hold memory
    * ∝ group size — the unbounded-group 100 TB path swaps in the
    * mergeable quantile sketch (q_quantile_rollup), same fences. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ord = load(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"), col("o_totalprice"))
    val med = ord.groupBy(col("prio").as("p1"))
      .agg(expr("percentile(o_totalprice, 0.5D)").as("med"))
    val dev = ord.join(broadcast(med), col("prio") === col("p1"))
      .withColumn("adev", abs(col("o_totalprice") - col("med")))
    val mad = dev.groupBy(col("prio").as("p2"))
      .agg(expr("percentile(adev, 0.5D)").as("mad"))
    dev.join(broadcast(mad), col("prio") === col("p2"))
      .groupBy(col("prio").as("o_orderpriority"))
      .agg(F.roundBin(max(col("med")), 2).as("med"),
        F.roundBin(max(col("mad")), 2).as("mad"),
        sum(when(col("adev") > lit(3) * lit(1.4826) * col("mad"), 1).otherwise(0))
          .cast("long").as("n_outliers"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Deterministic per-group mode: the most frequent event_type per
    * day, ties broken by value order — a count at (day, type) grain
    * (map-side combined) followed by a day-partitioned argmax window.
    * Never uses a nondeterministic `mode()` aggregate: the
    * (cnt desc, et) rank is total, so results are engine-exact. */
  def modeGroups(spark: SparkSession, dir: String): DataFrame = {
    val counts = load(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"),
        lower(coalesce(col("event_type"), lit(""))).as("et"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("dt"))
      .orderBy(col("cnt").desc, col("et"))
    counts.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("dt"), col("et").as("mode_event"), col("cnt"))
      .orderBy(col("dt"))
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    * user. The classic date-minus-row_number trick — one
    * (user)(day) window, then a (user, group) aggregation; both
    * stages ride the same user-hash exchange. Day grain bounds the
    * window input at users×days regardless of event volume. */
  def gapsIslands(spark: SparkSession, dir: String): DataFrame = {
    val days = load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    days.withColumn("grp",
        datediff(col("d"), lit("1970-01-01").cast("date")) - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(date_format(min(col("d")), "yyyy-MM-dd").as("island_start"),
        date_format(max(col("d")), "yyyy-MM-dd").as("island_end"),
        count(lit(1)).as("len"))
      .where(col("len") >= 3)
      .select(col("user_id"), col("island_start"), col("island_end"), col("len"))
      .orderBy(col("user_id"), col("island_start"))
  }

  /** Share-of-total window: each event type's share of its day's
    * events — a partition-only window aggregate (no ORDER BY, no sort:
    * just one hash exchange at the already-aggregated (day, type)
    * grain). */
  def shareOfDay(spark: SparkSession, dir: String): DataFrame = {
    val counts = load(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"),
        lower(coalesce(col("event_type"), lit(""))).as("et"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("dt"))
    counts.select(col("dt"), col("et"), col("cnt"),
        F.roundBin(col("cnt") / sum(col("cnt")).over(w), 6).as("share"))
      .orderBy(col("dt"), col("et"))
  }

  /** Year-over-year growth of monthly order revenue: lag(12) over the
    * gap-free month series. Per-row prices quantize to DECIMAL so the
    * monthly sums are exact; the single-partition window runs at
    * month grain (bounded by the calendar — 12 rows/year at any data
    * scale). */
  def yoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val monthly = load(spark, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(20,4)")).as("rev"))
    val w = Window.orderBy(col("month"))
    monthly
      .withColumn("prev", lag(col("rev"), 12).over(w))
      .select(col("month"),
        F.roundBin(col("rev").cast("double"), 2).as("revenue"),
        F.roundBin(
          (col("rev").cast("double") - col("prev").cast("double"))
            / col("prev").cast("double"), 6).as("yoy_growth"))
      .orderBy(col("month"))
  }

  /** Equi-depth histogram of order totalprice, 8 buckets per
    * priority: ntile over the (rounded price, orderkey) total order —
    * rank arithmetic only, no FP boundary comparisons, so the bucket
    * assignment is engine-exact. Partitioned by priority so buckets
    * build in parallel; for unbounded single-group inputs the 100 TB
    * path is the mergeable quantile sketch (q_quantile_rollup) — this
    * is its exact complement at partitionable grain. */
  def equidepthHist(spark: SparkSession, dir: String): DataFrame = {
    val ord = load(spark, dir, "orders")
      .withColumn("price", F.roundBin(col("o_totalprice"), 2))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price"), col("o_orderkey"))
    ord.withColumn("bucket", ntile(8).over(w))
      .groupBy(col("o_orderpriority"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        F.roundBin(min(col("price")), 2).as("lo"),
        F.roundBin(max(col("price")), 2).as("hi"))
      .orderBy(col("o_orderpriority"), col("bucket"))
  }
}
