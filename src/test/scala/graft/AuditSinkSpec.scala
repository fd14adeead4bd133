package graft

import org.apache.spark.sql.functions._

/** DSv2 write connector (graft-audit): write-audit-publish — stats
  * folded per task, merged at driver commit, atomically published.
  */
class AuditSinkSpec extends SparkSpec {

  private def parse(path: String): Map[String, Any] = {
    // the audit JSON is flat and builder-controlled — a tiny parse by
    // the same duckdb-free rules the spec needs (no deps available)
    val s = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val rows = """"rows": (\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
    Map("raw" -> s, "rows" -> rows)
  }

  test("audit stats match an independent aggregation; commit is atomic") {
    val out = java.nio.file.Files.createTempDirectory("graft-audit")
    out.toFile.deleteOnExit()
    val path = out.resolve("audit.json").toString
    val df = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .repartition(4) // force multiple tasks => multiple commit messages
    df.write.format("graft-audit").option("path", path).mode("overwrite").save()
    val audit = parse(path)
    val raw = audit("raw").asInstanceOf[String]
    assert(audit("rows") == df.count())
    val exp = df.agg(
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("nulls"),
      min(col("value")).as("mn"), max(col("value")).as("mx"),
      sum(col("value")).as("sm")).head()
    val valueBlock = """"value": \{"nulls": (\d+), "min": ([-\d.E]+), "max": ([-\d.E]+), "sum": ([-\d.E]+)\}""".r
      .findFirstMatchIn(raw).getOrElse(fail(s"no value stats in $raw"))
    assert(valueBlock.group(1).toLong == exp.getAs[Long]("nulls"))
    assert(math.abs(valueBlock.group(2).toDouble - exp.getAs[Double]("mn")) < 1e-9)
    assert(math.abs(valueBlock.group(3).toDouble - exp.getAs[Double]("mx")) < 1e-9)
    assert(math.abs(valueBlock.group(4).toDouble - exp.getAs[Double]("sm")) < 1e-6)
    // string column: nulls only, no numeric stats
    assert(raw.contains(""""event_type": {"nulls": """))
    assert(!raw.matches(""".*"event_type": \{"nulls": \d+, "min".*"""))
    // no temp file survives the atomic publish
    assert(out.toFile.listFiles().map(_.getName).toSet == Set("audit.json"))
  }

  test("clusterBy: sink-required distribution + sort hold; audit proves no key split (r9)") {
    val out = java.nio.file.Files.createTempDirectory("graft-audit-clu")
    out.toFile.deleteOnExit()
    val path = out.resolve("audit.json").toString
    // adversarial input layout: keys interleaved round-robin across 7
    // partitions — the sink's RequiresDistributionAndOrdering must
    // override this with a hash exchange on k plus an in-task sort
    val df = Tables.load(spark, sf, "events")
      .select((col("user_id") % 50).as("k"), col("value"))
      .repartition(7)
    df.write.format("graft-audit").option("path", path)
      .option("clusterBy", "k").mode("overwrite").save()
    val raw = parse(path)("raw").asInstanceOf[String]
    val m = """"cluster": \{"by": "k", "tasks": (\d+), "sorted_within_tasks": (\w+), "key_groups": (\d+)\}""".r
      .findFirstMatchIn(raw).getOrElse(fail(s"no cluster block in $raw"))
    // the writer verified Spark delivered the required ASC order
    assert(m.group(2) == "true", s"required sort not delivered: $raw")
    // Σ per-task key groups == global distinct IFF no key straddles
    // two tasks — the mechanical witness that clustering was enforced
    // (each task counts its distinct exactly BECAUSE of the sort)
    val exact = df.select(col("k")).distinct().count()
    assert(m.group(3).toLong == exact,
      s"key_groups ${m.group(3)} != exact distinct $exact — a key split across tasks")
    assert(m.group(1).toInt >= 1)

    // a clusterBy column absent from the write schema fails loudly at
    // plan time, not with a silent unclustered audit
    val e = intercept[Exception] {
      df.write.format("graft-audit")
        .option("path", out.resolve("bad.json").toString)
        .option("clusterBy", "nope").mode("overwrite").save()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("clusterBy column")), s"wrong failure: $e")
  }

  test("hostile column names and non-finite doubles still publish valid JSON (r9)") {
    val out = java.nio.file.Files.createTempDirectory("graft-audit-esc")
    out.toFile.deleteOnExit()
    val path = out.resolve("audit.json").toString
    import spark.implicits._
    // a quote and a backslash in the column name; NaN in the values
    Seq(1.0, Double.NaN, 3.0).toDF("va\"l\\ue")
      .write.format("graft-audit").option("path", path).mode("overwrite").save()
    val raw = parse(path)("raw").asInstanceOf[String]
    // must parse as JSON by an independent parser: Spark's own
    val parsed = spark.read.json(Seq(raw).toDS())
    assert(!parsed.columns.contains("_corrupt_record"),
      s"audit JSON invalid under hostile column name: $raw")
    assert(raw.contains("""va\"l\\ue"""), s"name not escaped: $raw")
    // NaN propagates through min/max/sum — rendered as a JSON string,
    // never as a bare NaN literal (invalid JSON)
    assert(raw.contains("\"NaN\""), s"non-finite not string-rendered: $raw")
  }

  test("empty input commits a zero-row audit without numeric blocks") {
    val out = java.nio.file.Files.createTempDirectory("graft-audit-empty")
    out.toFile.deleteOnExit()
    val path = out.resolve("audit.json").toString
    Tables.load(spark, sf, "events").select(col("event_id"), col("value"))
      .where(lit(false))
      .write.format("graft-audit").option("path", path).mode("overwrite").save()
    val raw = parse(path)("raw").asInstanceOf[String]
    assert(raw.contains(""""rows": 0"""))
    assert(!raw.contains(""""min""""), s"numeric stats on zero rows: $raw")
  }
}
