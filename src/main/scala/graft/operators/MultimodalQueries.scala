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
}
