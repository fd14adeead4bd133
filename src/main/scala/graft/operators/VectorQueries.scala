package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Vector similarity over the `embeddings` fixture (SURVEY.md §2.11
  * E3): brute-force cosine top-k as the exact baseline, plus a
  * random-hyperplane LSH bucketed variant as the 100 TB scale path.
  *
  * The cosine/norm kernels are native Catalyst expressions
  * (graft.functions.CosineSim / L2Norm): a fused single loop over the
  * raw float ArrayData, codegen-called — no per-row double-array
  * allocation, no interpreted lambda, and the surrounding
  * filter/project stays in one whole-stage-codegen span.
  *
  * Scale posture: brute-force against a single query vector is a
  * broadcast-join + TakeOrderedAndProject — linear scan, no shuffle of
  * the corpus, embarrassingly parallel. All-pairs work is blocked (by
  * label / LSH bucket) so pair counts stay bounded.
  */
object VectorQueries {
  import graft.Tables.load

  private def emb(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.install(spark)
    load(spark, dir, "embeddings")
  }

  /** E3 brute-force cosine top-k: 10 nearest neighbors of the vector
    * with the smallest vec_id. Broadcast the 1-row query side; rounded
    * score + vec_id tiebreak keeps the cut deterministic. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    val q = e.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    e.join(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"),
        F.roundBin(expr("cosine_sim(v, qv)"), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** E3 vector stats: per-label count and average L2 norm. */
  def vecNorms(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("label"), expr("l2_norm(embedding)").as("n2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), F.roundBin(avg(col("n2")), 4).as("avg_norm"))
      .orderBy(col("label"))

  /** E3/E2 embedding-cosine near-dup pairs, blocked by label: pairs
    * with cosine ≥ 0.3 (fixture cosines top out ≈0.47). The label
    * blocking bounds the self-join; at 100 TB the block key would be an
    * LSH bucket (see annLsh). */
  def cosineDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
      .select(col("label"), col("vec_id"), col("embedding").as("v"))
    val a = e.select(col("label"), col("vec_id").as("a_id"), col("v").as("av"))
    val b = e.select(col("label"), col("vec_id").as("b_id"), col("v").as("bv"))
    a.join(b, Seq("label"))
      .where(col("a_id") < col("b_id"))
      .withColumn("cos", expr("cosine_sim(av, bv)"))
      .where(col("cos") >= 0.3)
      .select(col("a_id"), col("b_id"), F.roundBin(col("cos"), 4).as("cos"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** E2/E3 embedding-cosine near-dup at scale: LSH-bucket blocking
    * instead of label blocking — candidate pairs only form inside a
    * hyperplane bucket, so pair count scales with Σ bucket² instead of
    * corpus². Recall vs. the exact label-blocked variant is spec-
    * checked; rows-only under the gate (hash-derived buckets). */
  def cosineDedupLsh(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    val e = base.withColumn("bucket",
      F.hyperplaneBucket(col("v"), sigBitsFor(base.count())))
    val a = e.select(col("bucket"), col("vec_id").as("a_id"), col("v").as("av"))
    val b = e.select(col("bucket"), col("vec_id").as("b_id"), col("v").as("bv"))
    a.join(b, Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .withColumn("cos", F.cosineSim(col("av"), col("bv")))
      .where(col("cos") >= 0.3)
      .select(col("a_id"), col("b_id"), F.roundBin(col("cos"), 4).as("cos"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** LSH signature width for an n-vector corpus: enough hyperplanes
    * that the AVERAGE bucket holds ~targetBucket vectors —
    * ceil(log2(n / targetBucket)) — clamped to [4, 24] (below 4 the
    * buckets stop discriminating; 2^24 bucket ids cover any corpus
    * whose per-bucket scan is the intended unit of work). Corpus-size
    * derived, so the same code under-buckets neither the 500-vector
    * fixture nor a 10^10-vector production table (knob math in
    * SCALE.md §vectors). */
  private[graft] def sigBitsFor(n: Long, targetBucket: Int = 64): Int = {
    val raw = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(24, math.max(4, raw))
  }

  /** IVF list count: ~sqrt(n) lists — the classic balance point
    * between per-vector assignment cost (O(nlist) per row) and
    * per-query probe cost (O(nprobe · n / nlist)) — clamped to
    * [4, 65536]. */
  private[graft] def nlistFor(n: Long): Int =
    math.min(65536, math.max(4, math.round(math.sqrt(n.toDouble)).toInt))

  /** E3 scale path #2: IVF (inverted-file) ANN. Coarse quantizer =
    * `nlist` deterministic seed centroids (the lowest-vec_id vectors —
    * a stand-in for k-means that keeps the fixture pipeline seedless);
    * every vector is assigned to its nearest centroid by cosine
    * (broadcast centroids, map-side, no shuffle of the corpus), and a
    * query scans only the `nprobe` lists nearest to it. At 100 TB the
    * assignment is written once partitioned by list id; each query
    * reads nprobe/nlist of the corpus. Rows-only under the gate
    * (centroid choice is engine-defined); recall vs knnBrute is
    * spec-checked. */
  def annIvf(spark: SparkSession, dir: String,
             nlistOpt: Option[Int] = None, nprobeOpt: Option[Int] = None): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    val nlist = nlistOpt.getOrElse(nlistFor(e.count()))
    val nprobe = nprobeOpt.getOrElse(math.max(2, nlist / 4))
    val centroids = e.orderBy(col("vec_id")).limit(nlist)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    // assignment: argmax cosine over the broadcast centroid LIST — the
    // nlist centroids collapse to one array<struct> row (sort_array →
    // ties break to lowest c_id inside nearest_centroid), broadcast-
    // nested-loop-joined onto the corpus, and the native
    // nearest_centroid kernel picks the list in a single fused loop.
    // Truly map-side: the corpus branch has no Exchange (asserted in
    // PlanSpec); the r1 formulation (corpus×nlist expand + per-vec_id
    // row_number window) shuffled 16× the corpus on vec_id.
    val centroidList = centroids
      .agg(sort_array(collect_list(struct(col("c_id"), col("cv")))).as("cents"))
    val assigned = e.join(broadcast(centroidList))
      .select(col("vec_id"), col("v"),
        F.nearestCentroid(col("v"), col("cents")).as("list_id"))
    val q = e.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    // probe set: the nprobe centroid lists nearest to the query
    val probes = centroids.join(broadcast(q))
      .select(col("c_id"),
        F.cosineSim(col("cv"), col("qv")).as("qc"))
      .orderBy(col("qc").desc, col("c_id")).limit(nprobe)
      .select(col("c_id").as("list_id"))
    assigned.join(broadcast(probes), Seq("list_id"))
      .join(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"),
        F.roundBin(F.cosineSim(col("v"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** E3 scale path: random-hyperplane LSH ANN via the native
    * hyperplane_bucket expression (graft.functions.HyperplaneBucket —
    * one fused loop with a cached sign matrix; the HOF formulation
    * codegen'd a bits×dim expression tree). Buckets the corpus by the
    * signature, then searches only the query's bucket. At 100 TB the
    * bucketed table is written once (partitioned by bucket) and each
    * query probes one partition — no corpus scan. No SQL oracle
    * (hash-derived hyperplanes); verified by VectorQueriesSpec. */
  def annLsh(spark: SparkSession, dir: String,
             targetBucket: Int = 64): DataFrame = {
    val base = emb(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    val bits = sigBitsFor(base.count(), targetBucket)
    val e = base.withColumn("bucket", F.hyperplaneBucket(col("v"), bits))
    val q = e.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    // multi-probe: the query's own bucket plus every Hamming-distance-1
    // neighbor signature — recall insurance for vectors near a
    // hyperplane boundary, at the cost of probing bits+1 of the 2^bits
    // partitions. The probe list is query-side (bits+1 rows) and
    // broadcast; the corpus stays put.
    val probeBuckets = col("bucket") +:
      (0 until bits).map(i => col("bucket").bitwiseXOR(lit(1L << i)))
    val probes = q.select(col("q_id"), col("qv"),
      explode(array(probeBuckets: _*)).as("bucket"))
    e.join(broadcast(probes), Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"),
        F.roundBin(expr("cosine_sim(v, qv)"), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }
}
