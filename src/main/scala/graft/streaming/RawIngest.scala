package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.EventSchema

/** Streaming raw-ingest stage
  * (reference: airflow/dags/ingest_clickstream_to_s3.py — Kafka poll
  * window → event-time (date,hour) bucketing → partitioned JSONL on
  * S3, at-least-once).
  *
  * Spark-first restatement (SURVEY.md §3 EP2): one Structured
  * Streaming query — source → event-time partition derivation →
  * partitioned file sink. The reference's in-memory bucket dict
  * (ingest_clickstream_to_s3.py:41) becomes a shuffle-free dynamic
  * partitioned write; its Kafka consumer-group offset tracking becomes
  * checkpointing, upgrading at-least-once to exactly-once (ST5).
  *
  * The transform is factored out so the Kafka path (value bytes →
  * from_json) and the file-source path (testable without a broker)
  * share identical semantics.
  */
object RawIngest {

  /** Event-time partition derivation with processing-time fallback for
    * missing/unparseable timestamps
    * (reference: ingest_clickstream_to_s3.py:36-51, P3/P4). */
  def withPartitions(events: DataFrame): DataFrame =
    events
      .withColumn("ts",
        coalesce(to_timestamp(col("event_ts")), current_timestamp()))
      .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("hour", date_format(col("ts"), "HH"))
      .drop("ts")

  /** Kafka-source variant (reference: ingest_clickstream_to_s3.py:17-31).
    * Not exercised in tests (no broker in the container); the file
    * variant below drives the identical transform. */
  def fromKafka(spark: SparkSession, bootstrap: String,
                topic: String = "clickstream.events"): DataFrame = {
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", 1000000L) // ST8 backpressure
      .load()
    withPartitions(
      raw.select(from_json(col("value").cast("string"), EventSchema.schema).as("e"))
        .select(col("e.*")))
  }

  /** File-source variant: JSONL dir as the stream (stand-in for the
    * Kafka topic with identical downstream semantics).
    *
    * `maxFilesPerTrigger` is ST8 backpressure on this source — the
    * file-source analogue of Kafka's maxOffsetsPerTrigger: AvailableNow
    * drains the backlog in bounded micro-batches instead of one giant
    * batch, capping per-batch memory/shuffle regardless of how far
    * behind the job is (RawIngestBackpressureSpec drives it). */
  def fromFiles(spark: SparkSession, inDir: String,
                maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(EventSchema.schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    withPartitions(reader.json(inDir))
  }

  /** Partitioned JSONL sink + checkpoint
    * (reference: ingest_clickstream_to_s3.py:65-81 S5). AvailableNow =
    * the reference's bounded poll window (ST1) — drain what exists,
    * then stop; re-invocation resumes from the checkpoint.
    *
    * The pre-sink repartition on the partition columns is the
    * small-files control: without it every task writes a file into
    * every (date,hour) dir it sees (tasks × partitions files per
    * batch); with it each (date,hour) is written by exactly one task —
    * the reference's one-object-per-bucket layout
    * (ingest_clickstream_to_s3.py:71), and the difference between
    * millions of tiny S3 objects and one per bucket at 100 TB. */
  def start(events: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    events
      .repartition(col("date"), col("hour"))
      .writeStream
      .format("json")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("date", "hour")
      .trigger(Trigger.AvailableNow())
      .start()

  /** End-to-end bounded ingest run (EP2 as one call). */
  def runOnce(spark: SparkSession, inDir: String, outDir: String,
              checkpointDir: String): Unit = {
    val q = start(fromFiles(spark, inDir), outDir, checkpointDir)
    q.awaitTermination()
  }
}
