package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal-column operator surface (SURVEY.md §2.11 E5) under the
  * correctness gate. The synthetic payload layout is predictable from
  * doc_id alone (length = 100 + doc_id % 50, duration = 1000 +
  * doc_id % 9000), so DuckDB can oracle-check the binary plumbing —
  * payload sizes, kind partitioning, frame explosion — without
  * sharing any code with the Spark side.
  */
object MultimodalQueries {

  /** E5: binary-column stats per media kind — proves payload bytes
    * survive the full synthesize → Dataset[Media] → DataFrame path. */
  def mediaStats(spark: SparkSession, dir: String): DataFrame = {
    Multimodal.synthesize(spark, dir).toDF()
      .select(col("kind"), col("media_id"),
        length(col("payload")).as("n_bytes"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        min(col("n_bytes")).cast("int").as("min_bytes"),
        max(col("n_bytes")).cast("int").as("max_bytes"))
      .orderBy(col("kind"))
  }

  /** E5: video frame sampling — posexplode over duration-derived
    * sequences; per-video frame counts are oracle-predictable. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesize(spark, dir).toDF()
    Multimodal.frameSample(media, everyMs = 1000)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(col("frame_ts_ms")).cast("long").as("last_ts_ms"))
      .orderBy(col("media_id"))
      .withColumnRenamed("media_id", "doc_id")
  }

  /** E5: batched stub-decoder feature extraction (mapPartitions over
    * the binary column — the real-decoder integration point). Payload
    * bytes are doc_id-arithmetic and the stub features accumulate in
    * exact dyadic fractions (Multimodal.decodeFeatures), so feat_sum
    * is fully oracle-predictable: a FULL rows+schema+hash gate, not
    * rows-only. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesize(spark, dir)
    Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        graft.functions.F.roundBin(
          aggregate(col("features"), lit(0.0), (a, x) => a + x), 4).as("feat_sum"))
      .orderBy(col("media_id"))
  }

  /** E5 (r13) EXACT payload dedup: group by the payload byte VALUE
    * (content equality — the same collapse key as every exact-dedup
    * shell here), one canonical media_id + copy count per distinct
    * payload. The engine works on bytes; the oracle predicts the
    * answer from doc_id arithmetic because the dedup corpus's payload
    * is a pure function of its (g, v) class
    * ([[Multimodal.synthesizeDedupCorpus]]) — the accuracy pattern of
    * q_media_features, extended to dedup. One linear hash-groupBy;
    * at 100 TB the groupBy key would be a 128-bit payload digest
    * computed map-side so only 16-byte keys shuffle (the
    * q_dedup_exact formulation) — at this payload size shipping the
    * 121 bytes is cheaper than a second pass. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    Multimodal.synthesizeDedupCorpus(spark, dir)
      .groupBy(col("payload"))
      .agg(min(col("media_id")).as("media_id"),
        count(lit(1)).as("n_copies"))
      .select(col("media_id"), col("n_copies"))
      .orderBy(col("media_id"))

  /** E5 (r13) PERCEPTUAL payload near-dup: dHash over the payload
    * grid ([[Multimodal.dhash64]]), routed through the same capped
    * banding funnel + exact-dup collapse shell as the text/vector
    * near-dup family. Funnel: exact-payload pre-collapse (identical
    * payloads hash identically — band once per distinct payload),
    * dHash at rep grain, 8 bands of 8 bits, grid-salted capped band
    * self-join ([[VectorQueries.gridSaltedSides]]), Hamming ≤ 6
    * verification map-side (bit_count(xor)), expansion of found rep
    * pairs back over exact-duplicate members. Recall is STRUCTURAL,
    * not probabilistic: a true near-dup pair differs in ≤ 6 bits, so
    * ≥ 2 of its 8 bands are untouched (pigeonhole) and the pair is
    * always a candidate — measured recall must be exactly 1.0 and is
    * required loudly. Precision is measured (found ⊆ same-group
    * truth) — cross-group dHashes are independent 64-bit patterns
    * (expected Hamming ≈ 32), so a ≤ 6 collision would mark a
    * synthesis regression.
    *
    * ACCURACY-GATED ORACLE (the funnel-family pattern): the funnel
    * runs live, recall+precision are measured against the
    * formula-derived same-group truth, and the emitted rows are that
    * truth (DuckDB pins it by the same doc_id arithmetic) plus the
    * oracle-fixed claims. The funnel corpus is the bounded slice
    * `id % max(7, ceil(n/120)) = 0 OR id < 120` — the modulus scales
    * with the corpus row count so the slice stays O(1) ids (~240) and
    * the same-group pair output stays gate-sized at EVERY SF (r14
    * advisor: the old fixed `% 7` kept a constant 1/7 of the corpus,
    * so truth/found pair sets grew quadratically with SF); the full
    * corpus is [[mediaDedup]]'s linear axis. Both accuracy claims
    * resolve DISTRIBUTED (r14, verdict item 2): recall is a semi-join
    * count of the truth pairs against the found stream, precision an
    * anti-join emptiness check — the found-pair set never collects to
    * the driver. */
  /** The bounded funnel slice (O(1) ids at every SF — see
    * [[mediaNearDup]]). */
  private[graft] def nearDupSlice(spark: SparkSession,
                                  dir: String): DataFrame = {
    val n = graft.Tables.rowCount(spark, dir, "documents")
    val sliceMod = math.max(7L, math.ceil(n / 120.0).toLong)
    Multimodal.synthesizeDedupCorpus(spark, dir)
      .where(col("media_id") % sliceMod === 0 || col("media_id") < 120)
  }

  /** The live dHash funnel's found-pair set (collapse + capped banding
    * + Hamming ≤ 6 verify + expansion), extracted so the SQL-interface
    * spec can pin the raw-SQL formulation against it (r14). */
  private[graft] def mediaNearDupFound(spark: SparkSession,
                                       dir: String): DataFrame = {
    val sampled = nearDupSlice(spark, dir)
    // exact-dup pre-collapse at payload grain (same shape as
    // VectorQueries.collapseExpandPairs; Hamming of an exact pair is 0
    // so every within-group pair qualifies without re-verification)
    val members = sampled
      .withColumn("rep_id", min(col("media_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("payload"))))
      .localCheckpoint()
    val reps = members.where(col("media_id") === col("rep_id"))
      .select(col("media_id"), col("payload"))
    val withH = reps.select(col("media_id"),
      Multimodal.dhash64("payload").as("dh"))
    val banded = withH.select(col("media_id"), col("dh"),
      posexplode(expr("transform(sequence(0, 7)," +
        " b -> shiftright(dh, b * 8) & 255)")).as(Seq("b", "h")))
    val (l0, r0) = VectorQueries.gridSaltedSides(
      banded, Seq("b", "h"), "media_id", VectorQueries.HotBucketCap)
    val repPairs = l0.withColumnRenamed("media_id", "a_id")
      .withColumnRenamed("dh", "a_dh")
      .join(r0.withColumnRenamed("media_id", "b_id")
        .withColumnRenamed("dh", "b_dh"), Seq("b", "h", "sa", "sb"))
      .where(col("a_id") < col("b_id"))
      .where(bit_count(col("a_dh").bitwiseXOR(col("b_dh"))) <= 6)
      .select(col("a_id"), col("b_id")).distinct()
    // expansion: cross-group member pairs + within-group pairs
    val cross = repPairs
      .join(members.select(col("rep_id").as("a_id"), col("media_id").as("x")), Seq("a_id"))
      .join(members.select(col("rep_id").as("b_id"), col("media_id").as("y")), Seq("b_id"))
      .select(least(col("x"), col("y")).as("a_id"),
        greatest(col("x"), col("y")).as("b_id"))
    val within = members.select(col("rep_id"), col("media_id").as("x"))
      .join(members.where(col("media_id") =!= col("rep_id"))
        .select(col("rep_id"), col("media_id").as("y")), Seq("rep_id"))
      .where(col("x") < col("y"))
      .select(col("x").as("a_id"), col("y").as("b_id"))
    cross.unionByName(within)
      .select(col("a_id"), col("b_id")).distinct()
  }

  def mediaNearDup(spark: SparkSession, dir: String): DataFrame = {
    val found = mediaNearDupFound(spark, dir).localCheckpoint()
    // formula truth: same pattern group g = id % 17 (the oracle's own
    // derivation) — a self-join of the O(1)-id slice, gate-sized by
    // construction; materialized once for the count + both join audits
    val sliceIds = nearDupSlice(spark, dir)
      .select(col("media_id"), (col("media_id") % 17).as("g"))
    val truth = sliceIds.select(col("media_id").as("a_id"), col("g"))
      .join(sliceIds.select(col("media_id").as("b_id"), col("g")), Seq("g"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .localCheckpoint()
    val nTruth = truth.count()
    require(nTruth == 0 || !found.isEmpty,
      s"mediaNearDup: total recall loss — $nTruth same-group " +
        "pairs exist but the dHash funnel produced zero")
    // distributed audits (r14): truth and found stay executor-side
    val hits = truth.join(found, Seq("a_id", "b_id"), "left_semi").count()
    val recall = if (nTruth == 0) 1.0 else hits.toDouble / nTruth
    require(recall >= 0.999, f"mediaNearDup: structural recall broken " +
      f"($recall%.3f) — a <=6-bit pair missed all 8 bands?")
    val precision =
      found.join(truth, Seq("a_id", "b_id"), "left_anti").isEmpty
    truth
      .withColumn("recall_ok", lit(recall >= 0.999))
      .withColumn("precision_ok", lit(precision))
      .orderBy(col("a_id"), col("b_id"))
  }
}
