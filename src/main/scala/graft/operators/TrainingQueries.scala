package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/** Training-data pipeline operators over the `documents` corpus
  * (SURVEY.md §2.11 extension surface): the steps between "deduped
  * corpus" and "token stream" that an LLM data pipeline runs at
  * 100 TB — sequence packing, quality-quantile pruning, and benchmark
  * decontamination. All three are oracle-gated (deterministic
  * formulations; DuckDB computes the same answer from the raw text).
  */
object TrainingQueries {
  import graft.Tables.load

  /** Driver cutover bound for [[corpusPipeline]]'s token-budget stage:
    * below this many corpus documents the (doc_id, n) pairs collect
    * (≤ 16 MB of longs at the bound) and the prefix cut walks in one
    * process; above it the two-pass distributed range cut runs.
    * Env-overridable (-1 forces the distributed branch). */
  private[graft] val TokenCutDriverMax =
    sys.env.getOrElse("SPARK_GRAFT_TOKENCUT_DRIVER_MAX", (1L << 20).toString).toLong

  private def withToks(df: DataFrame): DataFrame =
    df.withColumn("toks", split(col("text"), "\\s+"))

  /** Sequence packing (concat-and-chunk): documents are concatenated
    * in deterministic order (doc_id) within each source shard and cut
    * into fixed `budget`-token training sequences; a document belongs
    * to the sequence its first token lands in. Emits per-sequence
    * stats — the packing manifest.
    *
    * Scale shape: ONE window (cumulative token count) partitioned by
    * the shard key, so the shuffle moves (shard, doc_id, n_toks)
    * triples — never text — and each shard packs independently; at
    * 100 TB the shard key is (source, path-bucket) and the manifest
    * joins back to text on write. No global coordination: sequence
    * ids are per-shard, which is what data loaders consume. */
  def packSequences(spark: SparkSession, dir: String,
                    budget: Int = 256): DataFrame = {
    val docs = withToks(load(spark, dir, "documents"))
      .select(col("source"), col("doc_id"), size(col("toks")).as("n_toks"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum", sum(col("n_toks")).over(w))
      .withColumn("seq_id",
        floor((col("cum") - col("n_toks")) / lit(budget.toDouble)))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"), col("seq_id"))
  }

  /** Quality-quantile pruning: keep documents whose type-token ratio
    * is at or above their source's median — the per-source quality
    * cut that drops boilerplate-heavy shards' worst half without a
    * global threshold penalizing terse-but-clean sources.
    *
    * Scale shape: the per-source medians are a tiny aggregate
    * (|sources| rows) broadcast back onto the corpus — the second
    * pass is a map-side filter, no shuffle of documents. An exact
    * median needs the full score multiset per source (here: one
    * shuffle of (source, score) pairs); at 100 TB swap in
    * approx_percentile partial aggregation (see q_approx_percentile)
    * — the cut point moves by ε, the plan shape doesn't. */
  def qualityPrune(spark: SparkSession, dir: String): DataFrame = {
    val scored = withToks(load(spark, dir, "documents"))
      .select(col("source"), col("doc_id"),
        (size(array_distinct(col("toks"))) /
          size(col("toks")).cast("double")).as("ttr"))
    val med = scored.groupBy(col("source"))
      .agg(percentile(col("ttr"), lit(0.5)).as("med"))
    scored.join(broadcast(med), Seq("source"))
      .where(col("ttr") >= col("med"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        F.roundBin(avg(col("ttr")), 6).as("avg_ttr_kept"),
        min(col("doc_id")).as("min_kept"),
        max(col("doc_id")).as("max_kept"))
      .orderBy(col("source"))
  }

  /** Temperature-rebalanced mixture sampling (α = 0.5, rate τ = 0.8):
    * each source keeps k_s = min(n_s, ceil(τ · sqrt(n_s · n̄)))
    * documents — the sqrt-temperature flattening used to stop head
    * sources from drowning tail sources in a pretraining mixture
    * (upweights rare sources relative to their natural share; never
    * upsamples past n_s; τ sets the overall sampling rate so the cut
    * binds even on a perfectly balanced corpus). Selection is
    * deterministic: md5-ranked per source, exactly like
    * [[TextQueries.stratifiedSample]], so reruns and engines agree
    * row-for-row.
    *
    * Scale shape: source sizes are a |sources|-row aggregate joined
    * back by broadcast; the rank is one per-source window over
    * (source, doc_id) pairs — text never shuffles, and the sample
    * manifest joins back to content on write. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents").select(col("source"), col("doc_id"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val avgN = counts.agg(avg(col("n")).as("avg_n"))
    val quota = counts.join(broadcast(avgN))
      .select(col("source"),
        least(col("n"), ceil(sqrt(col("n") * col("avg_n")) * lit(0.8))).as("k"))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .join(broadcast(quota), Seq("source"))
      .where(col("rn") <= col("k"))
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Benchmark decontamination: training documents sharing any
    * 8-gram with the benchmark set (here: doc_id < `benchBelow` as
    * the stand-in eval suite) are flagged, grouped per source — the
    * train-test-overlap audit every pretraining corpus runs.
    *
    * Scale shape: the benchmark's distinct 8-gram fingerprints are a
    * BOUNDED set (eval suites are small by definition) collected to
    * one sorted array and broadcast; each training document then
    * answers "any of my grams in the set?" with Spark's codegen'd
    * `arrays_overlap` over the 8-byte fingerprints — a map-side scan
    * of the corpus, no shuffle, no gram explosion. (The explode-both-sides
    * equi-join variant only wins when the benchmark outgrows
    * broadcast size — then it shuffles |corpus|·grams rows.)
    * 8-gram hashes stand in for 8-gram strings exactly as in
    * [[TextQueries.ngramJaccard]]: identical overlap answers modulo
    * vanishing 64-bit collisions. */
  def decontaminate(spark: SparkSession, dir: String,
                    benchBelow: Long = 25L): DataFrame = {
    val grams = withToks(load(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        F.ngramHashes(col("toks"), 8).as("grams"))
    val bench = grams.where(col("doc_id") < benchBelow)
      .select(explode(col("grams")).as("g")).distinct()
      .agg(sort_array(collect_list(col("g"))).as("bench_grams"))
    grams.where(col("doc_id") >= benchBelow)
      .join(broadcast(bench))
      .where(arrays_overlap(col("grams"), col("bench_grams")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_contaminated"),
        min(col("doc_id")).as("first_bad"))
      .orderBy(col("source"))
  }

  /** BLOOM-pruned decontamination (r11) — the path for when the
    * benchmark gram set outgrows the exact broadcast that
    * [[decontaminate]] ships (a full eval-suite union can reach 10⁹
    * distinct 8-grams ≈ 8 GB as sorted longs): the benchmark grams
    * fold into ONE bloom sketch (a regular two-phase aggregate —
    * partials OR-merge, no row shuffle), every training document is
    * screened MAP-SIDE by the fused [[graft.functions.BloomAnyLong]]
    * kernel (early-exit loop, codegen, sketch deserialized once per
    * executor — not an interpreted per-gram HOF), and only the
    * surviving candidates explode to gram grain for the EXACT
    * confirm semi-join. Bloom filters have no false negatives, so
    * the output is bit-identical to the exact formulation — q_decontam_bloom
    * shares q_decontaminate's DuckDB oracle and must hash-match it.
    *
    * FPP discipline (the part a row-grain default gets wrong): an
    * ANY-of-k document probe compounds per-gram fpp to 1−(1−p)^k, so
    * the sketch is sized for p ≈ 3e-4 (≈2.1 bytes/gram — still 4×
    * smaller than the exact array, O(k) probe instead of O(k·log n))
    * keeping the expected false-candidate rate ~5% per ~150-gram
    * document; the exact confirm then touches ~|true hits| + 5% of
    * the corpus at gram grain instead of 100% of it. */
  def decontaminateBloom(spark: SparkSession, dir: String,
                         benchBelow: Long = 25L): DataFrame = {
    val grams = withToks(load(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        F.ngramHashes(col("toks"), 8).as("grams"))
    // bench gram set pinned ONCE (review r11): count (sizes the
    // sketch), the bloom build, and the exact confirm semi-join all
    // read the same blocks instead of each re-running the bench-slice
    // tokenize → ngram → explode → distinct pipeline
    val benchGrams = grams.where(col("doc_id") < benchBelow)
      .select(explode(col("grams")).as("g")).distinct()
      .localCheckpoint()
    // sketch sized for ~3e-4 per-gram FPP: bits ≈ 1.44·n·log2(1/p)
    val nBench = math.max(1L, benchGrams.count())
    val numBits = math.max(64L, (1.44 * nBench * (math.log(1.0 / 3e-4) / math.log(2.0))).toLong)
    val sketch = BloomJoin.buildSketchBits(benchGrams, col("g"), nBench, numBits)
    val candidates = grams.where(col("doc_id") >= benchBelow)
      .where(F.bloomAny(col("grams"), sketch))
    candidates
      .select(col("doc_id"), col("source"), explode(col("grams")).as("g"))
      .join(benchGrams, Seq("g"), "left_semi")
      .select(col("doc_id"), col("source")).distinct()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_contaminated"),
        min(col("doc_id")).as("first_bad"))
      .orderBy(col("source"))
  }

  /** Deterministic per-epoch global shuffle — the data-loader
    * primitive: every training epoch must visit the corpus in a
    * different but REPRODUCIBLE pseudo-random order (restarts resume
    * mid-epoch; two runs with the same seed see identical batches).
    * Each doc gets the order key md5(epoch ':' doc_id); ordering by
    * it IS the epoch's permutation.
    *
    * Scale shape: `repartitionByRange` on the key + per-partition
    * sort — ONE range-partitioned shuffle of (key, id) pairs, each
    * output shard internally ordered, shard boundaries globally
    * ordered; a loader consumes shard k of epoch e without any global
    * coordination, and NO single-partition window (the row_number
    * formulation of "global rank" serializes at the driver-adjacent
    * single partition — the classic 100 TB trap this avoids). md5
    * (not xxhash64) so the key is reproducible in ANY engine a loader
    * or auditor runs — the oracle certifies the exact permutation
    * keys, not just the shape. */
  def epochShuffle(spark: SparkSession, dir: String,
                   epoch: Int = 1): DataFrame = {
    load(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat_ws(":", lit(epoch).cast("string"),
          col("doc_id").cast("string"))).as("skey"))
      .repartitionByRange(col("skey"))
      .sortWithinPartitions(col("skey"))
  }

  /** Exact global TOKEN-BUDGET cut (r11) — "take the first B tokens
    * of the shuffled corpus": visit documents in the deterministic
    * [[epochShuffle]] order and keep each doc while the inclusive
    * global running token total stays ≤ B (here B = ⌊0.4 · corpus
    * tokens⌋). This is the loader-facing mix-assembly primitive —
    * prefix-cut semantics, NOT bin-packing: the first overflowing doc
    * and everything after it are dropped, so the kept set is a pure
    * function of (order key, budget) that any engine reproduces.
    *
    * Scale shape — a GLOBAL running sum with no global window: the
    * naive `sum(n) OVER (ORDER BY skey)` plans a single-partition
    * window (the 100 TB trap [[epochShuffle]]'s scaladoc names). Here
    * it is the classic two-pass distributed prefix scan instead:
    * (1) range-partition by the order key (boundaries globally
    * ordered, each shard internally sorted — pinned once via
    * localCheckpoint so both passes read the same layout);
    * (2) per-PARTITION token subtotals collect to the driver —
    * O(#partitions), not O(rows) — and a driver-side scan hands each
    * partition its global starting offset; (3) a map-side
    * per-partition sequential fold adds the offset and applies the
    * cut. mapPartitions is the sanctioned tool for exactly this
    * per-partition-ordered fold (SURVEY §2 last-resort rule); rows
    * carry (id, source, n_toks, key) — never text. At 100 TB the
    * offsets map also tells the planner which partitions lie wholly
    * past the cut — those tasks drain trivially here and would be
    * pruned outright in a production run. */
  /** DSIR — Data Selection via Importance Resampling (Xie et al.
    * 2023) restated on DataFrames (r13): select raw documents whose
    * hashed-n-gram distribution looks like a TARGET domain. The
    * published recipe exactly: featurize every document as counts
    * over B hash buckets of its word uni+bigrams; fit smoothed
    * bucket distributions p (target = the `lang = 'en'` slice — the
    * stand-in for "high-quality domain") and q (the raw corpus);
    * score each document with the bag-of-buckets log-likelihood
    * ratio log w(x) = Σ_grams log(p_b/q_b); resample top-k under
    * Gumbel noise (log w + Gumbel(u) with u a pure md5 hash of
    * doc_id — the paper's Gumbel-top-k trick, made deterministic and
    * engine-portable the same way q_weighted_sample's A-Res keys
    * are).
    *
    * Scale shape: grams hash to bucket ids IN THE PROJECTION (md5 mod
    * B — chosen over xxhash64 so DuckDB pins the identical buckets),
    * so nothing wider than (doc_id, bucket) ever shuffles; the two
    * distribution fits are B-row aggregates; the per-document score
    * is one partial-aggregated sum against a BROADCAST B-row
    * log-ratio table; the cut is one top-k. Everything is one pass
    * over the token stream — the shape that holds at 100 TB, where
    * the target fit comes from the small curated corpus and only q
    * rides the big scan. */
  def dsirSample(spark: SparkSession, dir: String,
                 buckets: Int = 128, k: Int = 20): DataFrame = {
    // spread the docs across the executor threads BEFORE the heavy
    // gram+md5 projection: the fixture corpus is one parquet file, so
    // without this the million-gram md5 stream runs on one task (at
    // 100 TB the scan is naturally thousands of splits and this
    // repartition is a cheap no-op-sized shuffle of raw doc rows)
    val docs = withToks(load(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism))
      .select(col("doc_id"), col("lang"), col("toks"))
    // uni+bigram stream; the size >= 2 guard matters: sequence(1, 0)
    // is DESCENDING in Spark and would mint phantom bigrams. The gram
    // array is built INLINE inside explode() — naming it with
    // withColumn first measured 8× slower (6 s vs 0.7 s at sf0.1):
    // the Generate then carries the materialized ~200-element array
    // column through its projection and copies it per OUTPUT row,
    // turning a linear explode into quadratic array copying.
    val gramArr = concat(col("toks"),
      when(size(col("toks")) >= 2,
        expr("transform(sequence(1, size(toks) - 1)," +
          " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .otherwise(array().cast("array<string>")))
    val grams = docs
      .select(col("doc_id"), col("lang"), explode(gramArr).as("gram"))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")
          % buckets).as("b"))
    // ONE pass over the token stream: everything downstream — both
    // distribution fits, the totals, and the per-doc scores — derives
    // from the (doc, lang, bucket)-grain count, materialized once
    // (explode + md5 would otherwise re-run per consumer; interpreted
    // HOF columns get no CSE, the repo-wide gotcha)
    val dc = grams.groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // both fits in ONE bucket-grain aggregate; the totals fold over
    // its B rows (trivial) instead of re-scanning the gram stream
    val bc = dc.groupBy(col("b"))
      .agg(sum(col("c")).as("rc"),
        coalesce(sum(when(col("lang") === "en", col("c")).otherwise(0L)),
          lit(0L)).as("tc"))
    val totals = bc.agg(coalesce(sum(col("rc")), lit(0L)).as("r_n"),
      coalesce(sum(col("tc")), lit(0L)).as("t_n"))
    // smoothed per-bucket log ratio — a B-row broadcast table
    val lr = bc.crossJoin(totals)
      .select(col("b"),
        log(((col("tc") + lit(0.5)) / (col("t_n") + lit(0.5 * buckets))) /
          ((col("rc") + lit(0.5)) / (col("r_n") + lit(0.5 * buckets))))
          .as("lw"))
    // per-document bag-of-buckets score against the broadcast table
    val scored = dc
      .join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("lw")).as("logw"))
    // Gumbel-top-k resample, deterministic: u from md5(doc_id)
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") + 1).cast("double") / lit(4294967296.0)
    scored
      .withColumn("gk", col("logw") + -log(-log(u)))
      .orderBy(col("gk").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), F.roundBin(col("logw"), 6).as("logw"))
      .orderBy(col("doc_id"))
  }

  /** E6 (r14, verdict item 6) END-TO-END corpus-cleaning COMPOSITION —
    * every stage exists as its own gated operator; this is the
    * composed lineage a real pre-training pipeline runs, chained
    * WITHOUT re-materialization so the stage boundaries are pinned:
    *
    *   raw → (1) exact dedup on the normalized text key
    *       → (2) near-dup canonical drop (exact trigram-shingle
    *             J ≥ 9/10 pairs among survivors; the greedy policy —
    *             drop any doc with a smaller-id qualifying partner)
    *       → (3) decontamination (drop the doc_id < 25 benchmark docs
    *             AND every survivor sharing an 8-gram with them)
    *       → (4) quality prune (5 ≤ tokens ≤ 2000 and ≥ half the
    *             tokens distinct — integer-exact rules)
    *       → (5) 60% token-budget prefix cut in epoch-shuffled order.
    *
    * Output: the per-stage manifest (stage, stage_name, n_docs,
    * n_tokens, id_sum) — one row per boundary, so ANY stage
    * regression (a lost doc, a changed drop set, a budget drift)
    * moves a pinned count; id_sum pins membership, not just
    * cardinality. DuckDB recomputes the whole chain from raw text.
    * TrainingPipelineSpec adds the conservation claims (monotone
    * counts, budget bound, stage-subset lineage).
    *
    * Scale shape: every stage is the already-graded operator's plan —
    * normalized-key window dedup, zero-false-negative prefix-filter
    * pair join, broadcast bench-gram semi-join, per-row integer
    * quality rules, two-pass range-partitioned prefix cut. Nothing
    * here adds a new scan shape; the composition is one lineage so
    * Spark pipelines stage filters into shared scans where legal. */
  def corpusPipeline(spark: SparkSession, dir: String,
                     frac: Double = 0.6,
                     cutDriverMax: Long = TokenCutDriverMax): DataFrame = {
    import spark.implicits._
    val raw = withToks(load(spark, dir, "documents"))
      .select(col("doc_id"), col("text"), col("toks"),
        size(col("toks")).cast("long").as("n"))
      .withColumn("nt", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
    // (1) exact dedup: keep the min doc_id per normalized-text key
    val s1 = raw
      .withColumn("keep", min(col("doc_id")).over(
        Window.partitionBy(col("nt"))))
      .where(col("doc_id") === col("keep"))
      .select(col("doc_id"), col("toks"), col("n"))
      .localCheckpoint() // consumed by stage 2 (twice) + the manifest
    // (2) near-dup canonical drop among survivors: the exact J >= 9/10
    // pair set restricted to survivor ids equals the pair set computed
    // among survivors (pair qualification is local to the two docs)
    val s1Ids = s1.select(col("doc_id"))
    val ndPairs = TextQueries.exactSimJoin(spark, dir, 9, 10)
      .join(s1Ids.select(col("doc_id").as("a_id")), Seq("a_id"), "left_semi")
      .join(s1Ids.select(col("doc_id").as("b_id")), Seq("b_id"), "left_semi")
    val s2 = s1.join(ndPairs.select(col("b_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
    // (3) decontam: bench grams come from the RAW corpus's doc_id < 25
    // eval slice (the q_decontaminate convention); the eval docs
    // themselves leave the corpus here too
    val grams = raw.select(col("doc_id"), F.ngramHashes(col("toks"), 8).as("grams"))
    val bench = grams.where(col("doc_id") < 25)
      .select(explode(col("grams")).as("g")).distinct()
      .agg(sort_array(collect_list(col("g"))).as("bench_grams"))
    val bad = grams.where(col("doc_id") >= 25)
      .join(broadcast(bench))
      .where(arrays_overlap(col("grams"), col("bench_grams")))
      .select(col("doc_id"))
    val s3 = s2.where(col("doc_id") >= 25)
      .join(bad, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    // (4) quality prune: integer-exact rules only (no float boundary).
    // No checkpoint (r14 optimization): s4 is a map-side filter over
    // the s3 checkpoint — re-running it costs less than materializing
    // another job, and below the stage-5 cutover it is consumed once.
    val s4 = s3.where(col("n") >= 5 && col("n") <= 2000 &&
        size(array_distinct(col("toks"))) * 2 >= col("n"))
    // the per-stage manifest: counts + token mass + membership checksum
    def stat(df: DataFrame, stage: Int, name: String): DataFrame =
      df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("n")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
        .select(lit(stage).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_tokens"), col("id_sum"))
    // (5) token-budget prefix cut in epoch-shuffled order (the
    // tokenBudget recipe: exact floor(total * frac) budget, md5 order).
    // ADAPTIVE cutover (r14, the globalNtile/bpeTrain discipline): the
    // cut consumes only (doc_id, n) and feeds only the two final
    // manifest rows, so below [[TokenCutDriverMax]] documents ONE
    // collect replaces the r14-build's four jobs (s4 checkpoint, total
    // aggregate, range-layout checkpoint, subtotal collect) — the skey
    // is a pure function of doc_id (md5 of "1:<id>", replayed
    // bit-identically in one process), the budget walk is the same
    // takeWhile, and the stage-4/5 stat rows are exact integer sums.
    // Above the bound the two-pass distributed prefix cut runs
    // unchanged — that is the 100 TB path.
    val stages45: DataFrame =
      if (graft.Tables.rowCount(spark, dir, "documents") <= cutDriverMax) {
        val rows = s4.select(col("doc_id"), col("n")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val md = java.security.MessageDigest.getInstance("MD5")
        def skey(id: Long): String =
          md.digest(s"1:$id".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
        val ordered = rows.sortBy { case (id, _) => (skey(id), id) }
        val budget = math.floor(rows.map(_._2).sum * frac).toLong
        var cum = 0L
        val kept = ordered.takeWhile { case (_, n) => cum += n; cum <= budget }
        def statRow(stage: Int, name: String,
            xs: Array[(Long, Long)]): DataFrame =
          Seq((stage, name, xs.length.toLong, xs.map(_._2).sum, xs.map(_._1).sum))
            .toDF("stage", "stage_name", "n_docs", "n_tokens", "id_sum")
        statRow(4, "quality", rows).unionByName(statRow(5, "token_budget", kept))
      } else {
        val s4c = s4.localCheckpoint()
        val keyed = s4c.select(col("doc_id"), col("n"),
          md5(concat_ws(":", lit("1"), col("doc_id").cast("string"))).as("skey"))
        val total = keyed.agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
        val budget = math.floor(total * frac).toLong
        val ranged = keyed
          .repartitionByRange(col("skey"), col("doc_id"))
          .sortWithinPartitions(col("skey"), col("doc_id"))
          .localCheckpoint()
        val ds = ranged.as[(Long, Long, String)]
        val subtotals = ds.mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var s = 0L
          it.foreach(s += _._2)
          Iterator((pid, s))
        }.collect().sortBy(_._1)
        val offsets = subtotals
          .scanLeft((-1, 0L)) { case ((_, acc), (pid, s)) => (pid, acc + s) }
          .sliding(2).map { case Array((_, off), (pid, _)) => pid -> off }
          .toMap
        val offB = spark.sparkContext.broadcast(offsets)
        val s5 = ds.mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var cum = offB.value.getOrElse(pid, sys.error(
            s"corpusPipeline: no subtotal for partition $pid — " +
              "partition layout changed between the two passes"))
          it.takeWhile { case (_, n, _) => cum += n; cum <= budget }
        }.toDF("doc_id", "n", "skey")
        stat(s4c, 4, "quality").unionByName(stat(s5, 5, "token_budget"))
      }
    stat(raw, 0, "raw")
      .unionByName(stat(s1, 1, "exact_dedup"))
      .unionByName(stat(s2, 2, "near_dup_drop"))
      .unionByName(stat(s3, 3, "decontam"))
      .unionByName(stages45)
      .orderBy(col("stage"))
  }

  def tokenBudget(spark: SparkSession, dir: String,
                  frac: Double = 0.4, epoch: Int = 1): DataFrame = {
    import spark.implicits._
    val docs = load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n_toks"),
        md5(concat_ws(":", lit(epoch).cast("string"),
          col("doc_id").cast("string"))).as("skey"))
    val total = docs.agg(sum(col("n_toks"))).head().getLong(0)
    // IEEE double multiply of an exact-integer total — bit-identical
    // to the oracle's floor(sum(n) * frac)
    val budget = math.floor(total * frac).toLong
    val ranged = docs
      .repartitionByRange(col("skey"), col("doc_id"))
      .sortWithinPartitions(col("skey"), col("doc_id"))
      .select(col("doc_id"), col("source"), col("n_toks"), col("skey"))
      .localCheckpoint()
    val ds = ranged.as[(Long, String, Long, String)]
    val subtotals = ds.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var s = 0L
      it.foreach(s += _._3)
      Iterator((pid, s))
    }.collect().sortBy(_._1)
    val offsets = subtotals
      .scanLeft((-1, 0L)) { case ((_, acc), (pid, s)) => (pid, acc + s) }
      .sliding(2).map { case Array((_, off), (pid, _)) => pid -> off }
      .toMap
    val offB = spark.sparkContext.broadcast(offsets)
    ds.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      // a pid absent from the offsets map means the partition layout
      // changed between the two passes (e.g. a shuffle/coalesce crept
      // in after the localCheckpoint) — a silent 0 offset here would
      // yield a plausible-but-wrong cut, so fail loudly instead
      var cum = offB.value.getOrElse(pid, sys.error(
        s"tokenBudget: no subtotal for partition $pid — " +
          "partition layout changed between the two passes"))
      it.takeWhile { case (_, _, n, _) => cum += n; cum <= budget }
    }.toDF("doc_id", "source", "n_toks", "skey")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_toks")).as("n_tokens_kept"))
      .orderBy(col("source"))
  }
}
