package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.model.EventSchema

/** ST5 scale path: `dropDuplicatesWithinWatermark` — the
  * bounded-state variant of ingest dedup (state holds only keys
  * within the watermark horizon instead of every key ever seen).
  * Exactly-once output still holds across batches because a
  * re-delivered duplicate is caught by ONE of two mechanisms: inside
  * the horizon the state hit drops it, behind the horizon the
  * stateful operator's late filter drops it. The unbounded
  * `dropDuplicates` gate (q_stream_dedup) stays the semantic anchor;
  * this spec pins the tradeoff the SCALE.md ingest notes describe.
  */
class StreamingDedupSpec extends SparkSpec {

  private def jline(id: String, ts: String): String =
    s"""{"event_ts":"$ts","user_id":"u_1","session_id":"$id",""" +
      s""""event_type":"page_view","page":"/","product_id":"sku_1",""" +
      s""""price":null,"currency":"USD","referrer":"direct","user_agent":"ua"}"""

  test("re-delivered duplicates never re-emit: state hit within horizon, late filter behind it") {
    val in = Files.createTempDirectory("ddw-in")
    val out = Files.createTempDirectory("ddw-out")
    val ck = Files.createTempDirectory("ddw-ck")
    Seq(in, out, ck).foreach(_.toFile.deleteOnExit())

    def runOnce(): Unit = {
      val q = spark.readStream.schema(EventSchema.schema).json(in.toString)
        .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.col("event_ts")))
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark("session_id")
        .writeStream.format("parquet").option("path", out.toString)
        .outputMode("append").option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // batch 1: two events + an advancer → watermark 10:30 for batch 2
    Files.writeString(in.resolve("f1.json"), Seq(
      jline("e1", "2024-03-01T10:00:00Z"),
      jline("e2", "2024-03-01T10:10:00Z"),
      jline("adv", "2024-03-01T11:00:00Z")).mkString("\n") + "\n")
    runOnce()
    // batch 2: at-least-once re-delivery of BOTH regimes plus one new
    // event — e2's duplicate is behind the 10:30 watermark (late
    // filter), adv's duplicate is within the horizon (state hit)
    Files.writeString(in.resolve("f2.json"), Seq(
      jline("e2", "2024-03-01T10:10:00Z"),
      jline("adv", "2024-03-01T11:00:00Z"),
      jline("e3", "2024-03-01T11:05:00Z")).mkString("\n") + "\n")
    runOnce()

    val ids = spark.read.schema(EventSchema.schema).parquet(out.toString)
      .collect().map(_.getAs[String]("session_id")).toSeq
    assert(ids.sorted === Seq("adv", "e1", "e2", "e3"),
      s"duplicate re-emitted or event lost: $ids")
  }

  test("streaming near-dup manifest equals the batch answer; pairs really cross batches (r10)") {
    val (res, nBatches) =
      graft.operators.PipelineQueries.streamNearDupCounted(spark, sf)
    assert(nBatches >= 3, s"expected >= 3 micro-batches, got $nBatches")
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the continuous-crawl guarantee: batch-by-batch maintenance must
    // lose NOTHING vs the full-corpus exact similarity join
    val expected = graft.operators.TextQueries.exactSimJoin(spark, sf, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected,
      s"stream manifest != batch: missing ${expected -- got}, extra ${got -- expected}")
    // batches are the doc_id mod-3 split, so an unequal-mod pair was
    // detected ACROSS batches (index probe) and an equal-mod pair
    // within one (self-join) — both detection paths really ran
    assert(got.exists { case (a, b) => a % 3 != b % 3 },
      "no cross-batch pair: the index-probe path was never exercised")
    assert(got.exists { case (a, b) => a % 3 == b % 3 },
      "no within-batch pair: the self-join path was never exercised")
  }

  test("near-dup drain is incremental: a second drain probes only new docs, appends only their pairs (r10)") {
    import org.apache.spark.sql.functions._
    import graft.operators.{PipelineQueries, TextQueries}
    val in = Files.createTempDirectory("ndup2-in")
    val out = Files.createTempDirectory("ndup2-out")
    val idx = Files.createTempDirectory("ndup2-idx")
    val ck = Files.createTempDirectory("ndup2-ck")
    Seq(in, out, idx, ck).foreach(_.toFile.deleteOnExit())
    // drain 1: the full corpus in 3 files (the gate's split)
    val docs = Tables.load(spark, sf, "documents").select(col("doc_id"), col("text"))
    (0 until 3).foreach { k =>
      docs.where(pmod(col("doc_id"), lit(3)) === k)
        .select(to_json(struct(col("doc_id"), col("text"))).as("value"))
        .coalesce(1).write.mode("append").text(in.toString)
    }
    PipelineQueries.nearDupDrain(spark, in.toString, out.toString, idx.toString, ck.toString)
    val before = PipelineQueries.nearDupManifest(spark, out.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batchId-subpathed manifest layout (r11): list recursively
    def parquetFiles(dir: java.nio.file.Path): Set[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(dir)
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => (dir.relativize(p).toString, java.nio.file.Files.size(p))).toSet
      finally s.close()
    }
    val filesBefore = parquetFiles(out)
    // drain 2: ONE new doc — an exact copy of an existing doc's text
    // under a fresh id, so its shingle set (hence every jaccard) is
    // identical to the source doc's and the expected pair delta is
    // computable from the first manifest alone
    val srcId = before.head._1
    val srcText = docs.where(col("doc_id") === srcId).collect()(0).getString(1)
    val newId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    import spark.implicits._
    Seq((newId, srcText)).toDF("doc_id", "text")
      .select(to_json(struct(col("doc_id"), col("text"))).as("value"))
      .coalesce(1).write.mode("append").text(in.toString)
    val n2 = PipelineQueries.nearDupDrain(
      spark, in.toString, out.toString, idx.toString, ck.toString)
    assert(n2 >= 1L, "second drain processed no batch")
    val after = PipelineQueries.nearDupManifest(spark, out.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the clone pairs with its source (J=1.0) and with EXACTLY the
    // source's neighbors (identical shingle set => identical jaccards)
    val neighbors = before.collect {
      case (a, b) if a == srcId => b
      case (a, b) if b == srcId => a
    }
    val expectedDelta = (neighbors + srcId).map(y =>
      (math.min(y, newId), math.max(y, newId)))
    assert(after === before ++ expectedDelta,
      s"incremental delta wrong: missing ${(before ++ expectedDelta) -- after}, " +
        s"extra ${after -- (before ++ expectedDelta)}")
    // prior manifest files are append-only: byte-identical after drain 2
    val survivors = parquetFiles(out)
    assert(filesBefore.subsetOf(survivors),
      "a prior manifest file was rewritten — the drain is not append-only")
    // and the new pairs landed under a NEW batch subdir (the replay
    // key that makes retried batches overwrite instead of append)
    assert((survivors -- filesBefore).forall(_._1.startsWith("batch-")),
      s"unexpected layout: ${survivors -- filesBefore}")
  }
}
