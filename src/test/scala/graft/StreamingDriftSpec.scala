package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineQueries

/** Continuous drift monitoring (ST12 × E7): the incrementally
  * maintained day × event_type count table must equal a from-scratch
  * aggregation exactly, and maintenance must be O(new data) — a
  * second drain rewrites only touched day partitions, and within a
  * touched partition the keys the batch did not change survive the
  * key-grain upsert (the mechanism the additive-upsert and sketch
  * gates don't exercise).
  */
class StreamingDriftSpec extends SparkSpec {

  test("maintained count table equals a from-scratch aggregation; drain is incremental") {
    val (psi, nBatches) = PipelineQueries.streamDriftPsiCounted(spark, sf)
    assert(nBatches >= 2, s"expected an incremental drain, got $nBatches batch(es)")
    // PSI invariants hold on the streaming path too
    val rows = psi.collect()
    assert(rows.nonEmpty)
    val refDt = rows.map(_.getString(0)).min
    rows.foreach { r =>
      assert(r.getAs[Double]("psi") >= 0.0)
      if (r.getString(0) == refDt) assert(r.getAs[Double]("psi") == 0.0)
    }
    // per-day totals equal the batch ground truth under the cutoff
    val exp = Tables.load(spark, sf, "events")
      .where(to_date(col("ts")) < lit(PipelineQueries.StreamCutoff))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap == exp)
  }

  test("second drain: untouched days byte-identical, untouched keys survive the upsert") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("graft-drift-spec-in")
    val out = Files.createTempDirectory("graft-drift-spec-out")
    val ck = Files.createTempDirectory("graft-drift-spec-ck")
    Seq(in, out, ck).foreach(_.toFile.deleteOnExit())
    def line(dt: String, tp: String, i: Int): String =
      s"""{"event_ts": "${dt}T10:00:0${i % 10}Z", "user_id": "u$i", """ +
        s""""session_id": "s$i", "event_type": "$tp", "price": 1.0}"""
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.writeString(in.resolve(name), lines.mkString("", "\n", "\n"))
    // drain 1: day 1 (view only), day 2 (view + click)
    writeFile("f1.jsonl", (1 to 8).map(line("2024-03-01", "view", _)))
    writeFile("f2.jsonl", (1 to 3).map(line("2024-03-02", "view", _)) ++
      (4 to 6).map(line("2024-03-02", "click", _)))
    val n1 = PipelineQueries.driftCountDrain(spark, in.toString, out.toString, ck.toString)
    assert(n1 >= 2, s"expected >=2 maintenance batches, got $n1")
    def partFiles(dt: String): Map[String, (Long, Long)] = {
      val d = out.resolve(s"dt=$dt").toFile
      assert(d.isDirectory, s"missing partition dt=$dt")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.lastModified(), f.length()))).toMap
    }
    val day1Before = partFiles("2024-03-01")
    // drain 2, SAME checkpoint: new day-2 VIEW rows only + a new day 3
    writeFile("f3.jsonl", (7 to 11).map(line("2024-03-02", "view", _)) ++
      (1 to 4).map(line("2024-03-03", "view", _)))
    val n2 = PipelineQueries.driftCountDrain(spark, in.toString, out.toString, ck.toString)
    assert(n2 >= 1, s"second drain processed nothing (got $n2 batches)")
    assert(partFiles("2024-03-01") === day1Before,
      "day partition WITHOUT new data was rewritten — maintenance is not O(new data)")
    val got = PipelineQueries.driftCountTable(spark, out.toString)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-03-01", "view") -> 8L,
      // view went 3 -> 8 via the update-mode CUMULATIVE emit;
      // click was NOT in drain 2's batch and must survive via the
      // stored-row anti-join, not be dropped by the partition rewrite
      ("2024-03-02", "view") -> 8L,
      ("2024-03-02", "click") -> 3L,
      ("2024-03-03", "view") -> 4L), s"count table wrong: $got")
  }
}
