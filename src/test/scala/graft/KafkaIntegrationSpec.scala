package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.gen.{EventGenerator, KafkaSink}
import graft.streaming.RawIngest

/** S3/S4 broker round-trip, env-gated: produce → Kafka → ingest → KPI,
  * end-to-end against a REAL broker (reference:
  * kafka/producer/produce_events.py → broker →
  * airflow/dags/ingest_clickstream_to_s3.py:17-31).
  *
  * No broker (or Kafka connector jar) ships in this container, so the
  * sandbox permanently exercises the same transforms through the file
  * source instead (PipelineSpec, StreamingDedupSpec, q_stream_hourly).
  * The FIRST time an environment provides a broker, this spec closes
  * the loop for real: set
  *
  *   GRAFT_KAFKA_BOOTSTRAP=host:9092
  *
  * and run with the Kafka connector on the classpath (e.g.
  * `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>`).
  * Without the env var — or without the connector jar — every test
  * here cancels cleanly (reported as canceled, not failed).
  *
  * Covers: KafkaSink wire format through a real producer (S3),
  * RawIngest.fromKafka with event-time partitioning (S4), checkpointed
  * exactly-once re-drain (ST5: a second run with the same checkpoint
  * ingests nothing; newly produced messages and ONLY those arrive on
  * the third), and KPI parity between the broker-ingested zone and the
  * generator's events.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")

  private def connectorPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  private def gated(): String = {
    assume(bootstrap.nonEmpty,
      "GRAFT_KAFKA_BOOTSTRAP not set — skipping broker integration")
    assume(connectorPresent,
      "spark-sql-kafka connector not on classpath — skipping broker integration")
    bootstrap.get
  }

  test("produce -> broker -> ingest -> KPI round-trip is exactly-once") {
    val bs = gated()
    val topic = s"graft_it_${java.util.UUID.randomUUID().toString.take(8)}"
    val raw = Files.createTempDirectory("graft-kafka-raw"); raw.toFile.deleteOnExit()
    val ckpt = Files.createTempDirectory("graft-kafka-ckpt"); ckpt.toFile.deleteOnExit()

    // 1) produce the deterministic wire events (S3: real producer path)
    val events = EventGenerator.events(spark, 500, seed = "kafka-it", days = 2)
    KafkaSink.write(events, bs, topic)

    // 2) ingest through the real Kafka source (S4), bounded drain (ST1)
    def drain(): Unit =
      RawIngest.start(RawIngest.fromKafka(spark, bs, topic),
        raw.toString, ckpt.toString).awaitTermination()
    drain()
    val zone = () => spark.read.schema(graft.model.EventSchema.schema)
      .json(raw.toString + "/date=*/hour=*")
    assert(zone().count() === 500L, "first drain must land every produced event")

    // 3) exactly-once: same checkpoint, no new messages -> no new rows
    drain()
    assert(zone().count() === 500L, "re-drain with no new messages duplicated rows")

    // 4) incremental: produce 100 more, only those arrive
    KafkaSink.write(EventGenerator.events(spark, 100, seed = "kafka-it-2", days = 1), bs, topic)
    drain()
    assert(zone().count() === 600L, "incremental drain must add exactly the new messages")

    // 5) KPI parity: the broker-ingested zone yields the same totals
    //    as computing directly over the generated events
    val viaKafka = graft.batch.DailyKpis.compute(spark, raw.toString)
      .agg(sum("total_events")).head().getLong(0)
    assert(viaKafka === 600L, "KPI totals over the broker-ingested zone diverge")
  }
}
