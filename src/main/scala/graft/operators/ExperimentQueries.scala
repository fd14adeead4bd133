package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/** Experimentation + distribution-monitoring operators — the two
  * checks a production clickstream pipeline bolts on once KPIs exist
  * (the reference stops at daily KPIs, reference:
  * airflow/dags/daily_kpis.py:109-140; these are the next jobs the
  * same team schedules):
  *
  *  - '''Drift''': is today's event-mix still the distribution the
  *    models were trained on? (Population Stability Index per day vs
  *    a pinned reference day.)
  *  - '''A/B integrity''': is the experiment's traffic split actually
  *    the designed 50/50? (Deterministic hash assignment + the
  *    sample-ratio-mismatch chi-square gate every experimentation
  *    platform runs before believing a lift number.)
  *
  * Both shapes are 100 TB-safe by construction: the only data-sized
  * stage in each is ONE map-side-combinable aggregation down to a
  * tiny grain (day x event-type, or user), and everything after runs
  * on that aggregate with broadcast-only joins.
  */
object ExperimentQueries {
  import graft.Tables.load

  /** Per-day Population Stability Index of the event-type mix vs the
    * earliest day in the data (the "reference" window).
    *
    * PSI(day) = sum_t (p_t - q_t) * ln(p_t / q_t) over smoothed
    * shares p_t = (cnt_t + 0.5) / (n_day + 0.5 * K) (Laplace 0.5,
    * K = global type-vocabulary size) so a type absent from one day
    * stays finite instead of blowing up ln(0). PSI >= 0 always, = 0
    * for the reference day itself; > 0.1 is the classic "investigate"
    * threshold.
    *
    * Shape: one groupBy(day, type) count over events — the ONLY stage
    * that touches data, with map-side partials — then a
    * `localCheckpoint` pins the tiny day x type grid (days * K rows)
    * so the five downstream consumers (day totals, type vocabulary,
    * K, the zero-fill cross join, the reference-day slice) reuse the
    * materialized aggregate instead of re-scanning events. All joins
    * after the checkpoint are broadcastable by construction. */
  def driftPsi(spark: SparkSession, dir: String): DataFrame = {
    val counts = load(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val types = counts.select(col("event_type")).distinct()
    val kDf = types.agg(count(lit(1)).cast("double").as("k"))
    val days = counts.groupBy(col("dt")).agg(sum(col("cnt")).as("n_day"))
    // zero-fill: every (day, type) cell exists so smoothing sees the
    // absent types (share > 0 via the +0.5 prior)
    val grid = days.crossJoin(broadcast(types))
      .join(counts, Seq("dt", "event_type"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(kDf))
      .withColumn("share",
        (col("cnt") + lit(0.5)) /
          (col("n_day").cast("double") + lit(0.5) * col("k")))
    val refDay = grid.agg(min(col("dt")).as("dt"))
    val ref = grid.join(broadcast(refDay), "dt")
      .select(col("event_type"), col("share").as("ref_share"))
    grid.join(broadcast(ref), Seq("event_type"))
      .groupBy(col("dt"))
      .agg(
        max(col("n_day")).as("n_events"),
        F.roundBin(sum((col("share") - col("ref_share")) *
          log(col("share") / col("ref_share"))), 6).as("psi"))
      .orderBy(col("dt"))
  }

  /** Critical value of chi-square with 1 dof at alpha = 0.05 — the
    * standard SRM gate. */
  val SrmChi2Crit = 3.841

  /** Deterministic 50/50 A/B assignment + sample-ratio-mismatch gate.
    *
    * Assignment is a pure function of user_id (first two hex chars of
    * md5 of the decimal id, '80' boundary = 128/256 buckets), the same
    * engine-portable recipe as [[AnalyticsExtras.trainSplit]]: stable
    * across runs, engines and re-shards, so a user never flips
    * variant mid-experiment. Per variant: users, events, converters
    * (any purchase), revenue, conversion rate — plus the SRM
    * chi-square over observed vs expected (total/2) user counts and
    * its alpha=0.05 verdict. srm_detected=true means the traffic
    * split itself is broken and every downstream lift number is
    * invalid — the check runs BEFORE any metric is read.
    *
    * Shape: one user-grain aggregation (the natural experiment grain;
    * map-side combinable, one shuffle on user_id), then a 2-row
    * variant rollup; the chi-square runs as a window over that 2-row
    * frame — no driver-side math, no second pass over data. */
  def abSrm(spark: SparkSession, dir: String): DataFrame = {
    val isPurchase = lower(coalesce(col("event_type"), lit(""))) === "purchase"
    val users = load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        max(when(isPurchase, 1L).otherwise(0L)).as("converted"),
        sum(when(isPurchase, coalesce(col("value"), lit(0.0)))
          .otherwise(0.0)).as("revenue"))
      .withColumn("variant",
        when(substring(md5(col("user_id").cast("string")), 1, 2) < "80", "A")
          .otherwise("B"))
    val byVariant = users.groupBy(col("variant"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        sum(col("converted")).as("n_converted"),
        F.roundBin(sum(col("revenue")), 2).as("revenue"))
    val w = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byVariant
      // two window passes over the SAME 2-row frame (one exchange;
      // windows can't nest, so expected-count materializes first)
      .withColumn("exp_users", sum(col("n_users")).over(w).cast("double") / 2.0)
      .withColumn("chi2",
        sum(pow(col("n_users").cast("double") - col("exp_users"), 2) /
          col("exp_users")).over(w))
      .select(
        col("variant"), col("n_users"), col("n_events"), col("n_converted"),
        F.roundBin(col("n_converted").cast("double") / col("n_users"), 4)
          .as("conv_rate"),
        col("revenue"),
        F.roundBin(col("chi2"), 4).as("srm_chi2"),
        // NOT named *_ok: graft.Verify treats *_ok columns as engine
        // self-check claims and fails the dump on false, but a
        // detected mismatch is a legitimate DATA verdict (the tiny
        // sf0.001 fixture genuinely trips it: 3 vs 12 users, chi2=5.4)
        (col("chi2") >= lit(SrmChi2Crit)).as("srm_detected"))
      .orderBy(col("variant"))
  }
}
