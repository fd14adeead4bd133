package graft

import java.nio.file.Files
import graft.jobs.{DailyKpisMain, JobArgs}
import graft.operators.PipelineQueries

/** spark-submit job surface: arg parsing, P11 date precedence through
  * the CLI, and the DailyKpis job end-to-end (partitioned raw zone →
  * dt=-partitioned KPI parquet).
  */
class JobsSpec extends SparkSpec {

  test("JobArgs.parse splits positionals and --flags") {
    val (pos, flags) = JobArgs.parse(
      Array("/raw", "--date", "2024-01-03", "/out", "--all-days", "true"))
    assert(pos === Vector("/raw", "/out"))
    assert(flags === Map("date" -> "2024-01-03", "all-days" -> "true"))
  }

  test("runDate precedence: explicit --date wins; absent flags fall through") {
    assert(JobArgs.runDate(Map("date" -> "2024-01-03")) === "2024-01-03")
    // quote/whitespace trim (P10) survives the CLI path
    assert(JobArgs.runDate(Map("date" -> " '2024-01-04' ")) === "2024-01-04")
    // no flag, no env in the test harness: resolves to a valid date
    // (today) rather than throwing
    assert(JobArgs.runDate(Map.empty).matches("\\d{4}-\\d{2}-\\d{2}"))
  }

  test("DailyKpisMain.run --date: single-day KPI parquet under dt=<day>") {
    val zone = PipelineQueries.writePartitionedZone(spark, sf)
    val out = Files.createTempDirectory("graft-kpis-out")
    out.toFile.deleteOnExit()
    val day = DailyKpisMain.run(spark, zone, out.toString,
      Map("date" -> PipelineQueries.PruneDay))
    assert(day === Some(PipelineQueries.PruneDay))
    val dtDir = out.resolve(s"dt=${PipelineQueries.PruneDay}")
    assert(Files.exists(dtDir), s"missing partition dir $dtDir")
    val kpis = spark.read.parquet(out.toString)
    val row = kpis.collect()
    assert(row.length === 1)
    assert(row.head.getAs[Long]("total_events") > 0L)
  }

  test("DailyKpisMain.run --all-days: one KPI row per day in the zone") {
    val zone = PipelineQueries.writePartitionedZone(spark, sf)
    val out = Files.createTempDirectory("graft-kpis-all")
    out.toFile.deleteOnExit()
    val day = DailyKpisMain.run(spark, zone, out.toString, Map("all-days" -> "true"))
    assert(day === None)
    val kpis = spark.read.parquet(out.toString)
    // zone holds days < StreamCutoff = 2024-01-06 → 5 event-days
    assert(kpis.select("dt").distinct().count() === 5L)
  }
}
