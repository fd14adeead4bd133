package graft

import org.apache.spark.sql.functions._

/** Skew-adversarial fixture sweep (r12, verdict item 3 — the r4
  * lesson applied to data SHAPE instead of scale): the declared
  * dedup/join/window families run twice, once against the uniform
  * fixture and once against a skew-stressed variant zone with the
  * SAME row counts but degenerate key distributions:
  *
  *  - events: 20% of rows remapped to ONE hot user_id (stresses every
  *    user-partitioned window/sessionize shape and any user-keyed
  *    join);
  *  - documents: ~20% of docs (1000 at sf0.1) share ONE text — a
  *    1000-copy mass duplicate (stresses the shingle/banding dedup
  *    funnels with a genuine quadratic pair clique);
  *  - embeddings: 30% of vectors identical (stresses the LSH /
  *    SemDeDup bucket funnels — the HotBucketCap path runs in anger).
  *
  * Row counts are held constant (victims are REWRITTEN, not appended)
  * so a skew/uniform time ratio isolates the distribution effect from
  * data volume. Any ratio well above the fixture's noise band is a
  * finding for SCALE.md. Writes skew_probe.json and prints one JSON
  * line; same measurement discipline as [[Bench]] (warmup + median of
  * 3, steal delta recorded).
  */
object SkewProbe {

  /** Dedup / join / window slate + one skew-invariant control. */
  val Slate: Seq[String] = Seq(
    // user-partitioned window / sessionize family (hot-user stress)
    "q_sessionize", "q_session_window", "q_gaps_islands",
    "q_attribution", "q_share_of_day",
    // join family (hot-key behavior; lineitem-side joins double as
    // controls — their keys are untouched by the zone)
    "q_salted_join", "q_bucketed_join", "q_join_semi", "q_asof_native",
    // text dedup funnels over the 1000-copy duplicate clique
    "q_dedup_exact", "q_minhash_dedup", "q_simjoin_prefix",
    "q_ngram_jaccard", "q_dup_clusters", "q_dup_canonical", "q_simhash",
    // vector dedup funnels over the 30%-identical corpus
    "q_cosine_dedup_lsh", "q_semdedup",
    // control: day-grain rollup, skew-invariant by construction
    "q_kpi_daily")

  /** Build the same-cardinality skew zone from `base`. */
  private[graft] def buildZone(spark: org.apache.spark.sql.SparkSession,
                               base: String): String = {
    val out = java.nio.file.Files.createTempDirectory("graft-skewzone")
    // pass-through tables: byte-identical copies
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(base, s"$t.parquet"),
        out.resolve(s"$t.parquet"))
    }
    // events: one hot user at 20% of rows (deterministic victim set)
    val ev = Tables.load(spark, base, "events")
    val hot = ev.agg(min(col("user_id"))).head().getLong(0)
    ev.withColumn("user_id",
        when(pmod(xxhash64(col("event_id")), lit(5)) === 0, lit(hot))
          .otherwise(col("user_id")))
      .write.mode("overwrite").parquet(out.resolve("events.parquet").toString)
    // documents: ~20% of docs share doc0's text (n_chars rewritten to
    // stay consistent with the text)
    val docs = Tables.load(spark, base, "documents")
    val d0 = docs.orderBy(col("doc_id")).limit(1)
      .select(col("text").as("dup_text"), col("n_chars").as("dup_chars"))
    docs.join(broadcast(d0))
      .withColumn("is_dup", pmod(xxhash64(col("doc_id")), lit(5)) === 0)
      .select(col("doc_id"),
        when(col("is_dup"), col("dup_text")).otherwise(col("text")).as("text"),
        col("lang"), col("source"),
        when(col("is_dup"), col("dup_chars")).otherwise(col("n_chars")).as("n_chars"))
      .write.mode("overwrite").parquet(out.resolve("documents.parquet").toString)
    // embeddings: 30% of vectors identical (keep victims' labels so the
    // label-blocked exact twin sees dense identical blocks)
    val emb = Tables.load(spark, base, "embeddings")
    val v0 = emb.orderBy(col("vec_id")).limit(1)
      .select(col("embedding").as("dup_v"))
    emb.join(broadcast(v0))
      .select(col("vec_id"),
        when(pmod(xxhash64(col("vec_id")), lit(10)) < 3, col("dup_v"))
          .otherwise(col("embedding")).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(out.resolve("embeddings.parquet").toString)
    out.toString
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outPath = if (args.length > 1) args(1) else "/root/repo/skew_probe.json"
    val stealStart = Bench.stealSeconds()
    val spark = Tables.session()
    spark.sparkContext.setLogLevel("WARN")
    val zone = buildZone(spark, base)
    System.err.println(s"[skew] zone built at $zone")
    try {

    val missing = Slate.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown slate queries: $missing")

    def timeOn(q: String, dir: String): Double = {
      val fn = SparkEntry.queries(q)
      Bench.forceEval(fn(spark, dir)) // warm: codegen + caches + manifests
      Seq.fill(3) {
        val t0 = System.nanoTime()
        Bench.forceEval(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }

    val times = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    for (q <- Slate) {
      val u = timeOn(q, base)
      val s = timeOn(q, zone)
      times(q) = (u, s)
      System.err.println(f"[skew] $q%-22s uniform=$u%.2fs skew=$s%.2fs " +
        f"ratio=${s / math.max(u, 1e-9)}%.2f")
    }

    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val body = times.map { case (q, (u, s)) =>
      s""""$q":{"uniform":${j(u)},"skew":${j(s)},"ratio":${j(s / math.max(u, 1e-9))}}"""
    }.mkString(",")
    val line = s"""{"metric":"skew_probe","sf":"$base","zone":""" +
      s"""{"events":"20pct rows on one hot user_id",""" +
      s""""documents":"20pct of docs share one text (1000-copy clique at sf0.1)",""" +
      s""""embeddings":"30pct identical vectors"},""" +
      s""""queries":{$body},"steal_sec":${j(Bench.stealSeconds() - stealStart)}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      line.getBytes("UTF-8"))
    println(line)
    // recursive delete in a finally (r12 advisor): deleteOnExit can't
    // remove a non-empty directory, so the corpus-sized zone leaked
    // permanently per run
    } finally {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(zone))
      try s.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally s.close()
    }
  }
}
