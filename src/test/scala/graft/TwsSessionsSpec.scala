package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StatefulSessions, TwsSessions}
import graft.streaming.StatefulSessions.SessionEvent

/** transformWithState sessionization (ST7, Spark 4 API): same
  * semantics as StatefulSessions — in-stream gap closure, trailing
  * flush via an explicit event-time TIMER (the API's replacement for
  * flatMapGroupsWithState's implicit timeout), state + timers
  * persisted in the RocksDB checkpoint across AvailableNow runs.
  */
class TwsSessionsSpec extends SparkSpec {

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def writeEvents(dir: java.nio.file.Path, name: String,
                          rows: Seq[(String, Long)]): Unit = {
    val lines = rows.map { case (u, t) =>
      val ts = new java.sql.Timestamp(t).toInstant.toString
      s"""{"user_id": "$u", "ts": "$ts"}"""
    }
    Files.writeString(dir.resolve(name), lines.mkString("\n") + "\n")
  }

  test("gap-closed sessions emit; trailing sessions flush on the registered timer") {
    import spark.implicits._
    val in = Files.createTempDirectory("tws-in")
    val out = Files.createTempDirectory("tws-out")
    val ck = Files.createTempDirectory("tws-ck")
    val base = 1700000000000L
    val min = 60000L

    def runOnce(): Unit = withRocksDb {
      val src = spark.readStream
        .schema("user_id STRING, ts TIMESTAMP")
        .json(in.toString)
        .as[SessionEvent]
      val q = TwsSessions.sessionize(src, gapSeconds = 1800)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .outputMode("append")
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def emitted(): Seq[(String, Long, Long)] =
      spark.read.parquet(out.toString).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getAs[Long]("n_events"))).toSeq

    // session1 (3 events), >30 min gap, session2 (2 events, trailing)
    writeEvents(in, "f1.json", Seq(
      ("a", base), ("a", base + min), ("a", base + 2 * min),
      ("a", base + 60 * min), ("a", base + 61 * min)))
    runOnce()
    assert(emitted() === Seq(("a", base, 3L)))

    // advance the watermark past session2 + gap, then one more batch
    // so the expired timer fires and flushes
    writeEvents(in, "f2.json", Seq(("a", base + 300 * min)))
    runOnce()
    writeEvents(in, "f3.json", Seq(("a", base + 301 * min)))
    runOnce()
    val e3 = emitted()
    assert(e3.contains(("a", base + 60 * min, 2L)),
      s"trailing session not flushed by timer: $e3")
    assert(!e3.exists(_._2 == base + 300 * min),
      s"open session must not emit: $e3")
  }

  test("batch agreement: transformWithState == flatMapGroupsWithState on fixture events") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Stream the same bounded fixture slice through BOTH stateful APIs
    // (sentinel closes every real session; cf. PipelineQueries
    // sessionsGate) and compare emitted sessions exactly.
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id").cast("string").as("user_id"), col("ts"))
    val flushTs = ev.agg((max(col("ts")) + expr("INTERVAL 365 DAYS")).as("ts"))
    val sentinels = ev.select(col("user_id")).distinct().crossJoin(flushTs)
    val in = Files.createTempDirectory("tws-cmp-in")
    ev.unionByName(sentinels)
      .select(to_json(struct(col("user_id"), col("ts"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(in.toString)

    def drain(api: String): Seq[(String, Long, Long, Long)] = {
      val out = Files.createTempDirectory(s"tws-cmp-out-$api")
      val ck = Files.createTempDirectory(s"tws-cmp-ck-$api")
      val src = spark.readStream.schema("user_id STRING, ts TIMESTAMP")
        .json(in.toString).as[SessionEvent]
      val sessions = api match {
        case "tws" => TwsSessions.sessionize(src, gapSeconds = 1800)
        case _ => StatefulSessions.sessionize(src, gapSeconds = 1800)
      }
      val run = () => {
        val q = sessions.writeStream.format("parquet")
          .option("path", out.toString).outputMode("append")
          .option("checkpointLocation", ck.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      if (api == "tws") withRocksDb(run()) else run()
      spark.read.parquet(out.toString).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getAs[Long]("n_events")))
        .toSeq.sorted
    }
    val tws = drain("tws")
    val fmgws = drain("fmgws")
    assert(tws.nonEmpty)
    assert(tws === fmgws)
  }
}
