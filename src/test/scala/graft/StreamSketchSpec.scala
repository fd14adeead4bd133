package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineQueries

/** Continuous sketch-table maintenance (ST12 × E6): after an
  * incremental multi-batch drain, every day's stored sketch must be
  * BIT-IDENTICAL to a from-scratch sketch of the same rows — register
  * max is lossless under arbitrary re-merge — and the drain must
  * genuinely run as multiple maintenance batches.
  */
class StreamSketchSpec extends SparkSpec {

  test("incrementally maintained sketch table equals a from-scratch build") {
    val (got, nBatches) = PipelineQueries.streamSketchTableCounted(spark, sf)
    assert(nBatches >= 2, s"expected an incremental drain, got $nBatches batch(es)")
    val gotRows = got.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // from-scratch: same zone rows (wire shape — user_id is a STRING
    // there, and hashing is type-sensitive), one direct sketch per day
    val exp = Tables.load(spark, sf, "events")
      .where(to_date(col("ts")) < lit(PipelineQueries.StreamCutoff))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(graft.functions.F.hllDistinct(col("user_id").cast("string"), 12).as("approx_users"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(gotRows.keySet === exp.keySet, s"day sets differ: $gotRows vs $exp")
    gotRows.foreach { case (dt, est) =>
      assert(est === exp(dt),
        s"$dt: incremental estimate $est != from-scratch ${exp(dt)} — merge lost information")
    }
    // sanity: estimates are near the exact per-day distincts
    val exact = Tables.load(spark, sf, "events")
      .where(to_date(col("ts")) < lit(PipelineQueries.StreamCutoff))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    gotRows.foreach { case (dt, est) =>
      val err = math.abs(est - exact(dt)).toDouble / math.max(1, exact(dt))
      assert(err <= 0.06, s"$dt: est=$est exact=${exact(dt)} err=$err")
    }
  }

  test("second drain rewrites only the day partitions with new data (O(new data), r8)") {
    import java.nio.file.Files
    import spark.implicits._
    val in = Files.createTempDirectory("graft-sksync-spec-in")
    val out = Files.createTempDirectory("graft-sksync-spec-out")
    val ck = Files.createTempDirectory("graft-sksync-spec-ck")
    Seq(in, out, ck).foreach(_.toFile.deleteOnExit())
    def line(dt: String, user: Int): String =
      s"""{"event_ts": "${dt}T10:00:0${user % 10}Z", "user_id": "u$user", """ +
        s""""session_id": "s$user", "event_type": "view", "price": 1.0}"""
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.writeString(in.resolve(name), lines.mkString("", "\n", "\n"))
    // drain 1: two day files
    writeFile("f1.jsonl", (1 to 8).map(line("2024-03-01", _)))
    writeFile("f2.jsonl", (1 to 6).map(line("2024-03-02", _)))
    val n1 = PipelineQueries.sketchMaintenanceDrain(
      spark, in.toString, out.toString, ck.toString)
    assert(n1 >= 2, s"expected >=2 maintenance batches, got $n1")
    def partFiles(dt: String): Map[String, (Long, Long)] = {
      val d = out.resolve(s"dt=$dt").toFile
      assert(d.isDirectory, s"missing partition dt=$dt")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.lastModified(), f.length()))).toMap
    }
    val day1Before = partFiles("2024-03-01")
    val day2Before = partFiles("2024-03-02")
    // drain 2, SAME checkpoint: one new file touching day 2 + a new day 3
    writeFile("f3.jsonl",
      (7 to 12).map(line("2024-03-02", _)) ++ (1 to 4).map(line("2024-03-03", _)))
    val n2 = PipelineQueries.sketchMaintenanceDrain(
      spark, in.toString, out.toString, ck.toString)
    assert(n2 >= 1, s"second drain processed nothing (got $n2 batches)")
    // untouched day: byte-for-byte the same files (names, mtimes, sizes)
    assert(partFiles("2024-03-01") === day1Before,
      "day partition WITHOUT new data was rewritten — maintenance is not O(new data)")
    // touched day rewritten; new day created
    assert(partFiles("2024-03-02") !== day2Before, "touched day was not rewritten")
    assert(partFiles("2024-03-03").nonEmpty, "new day partition missing after second drain")
    // the incrementally maintained sketches still equal a from-scratch
    // sketch over everything seen so far (register max is lossless)
    val gotRows = spark.read.parquet(out.toString)
      .select(col("dt").cast("string").as("dt"),
        graft.functions.F.hllEstimate(col("sk")).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val expected = Map(
      "2024-03-01" -> (1 to 8).map(i => s"u$i"),
      "2024-03-02" -> (1 to 12).map(i => s"u$i"),
      "2024-03-03" -> (1 to 4).map(i => s"u$i"))
    expected.foreach { case (dt, users) =>
      val exp = users.toDF("user_id")
        .agg(graft.functions.F.hllDistinct(col("user_id"), 12).as("n"))
        .collect().head.getLong(0)
      assert(gotRows(dt) === exp,
        s"$dt: incremental ${gotRows.get(dt)} != from-scratch $exp")
    }
  }
}
