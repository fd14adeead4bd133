package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.batch.Compaction

/** Small-files compaction: layout collapses, content doesn't change.
  * The compactor reads raw text lines (never parses), so malformed
  * lines — which the reference deliberately persists in the raw zone —
  * must survive byte-for-byte.
  */
class CompactionSpec extends SparkSpec {

  private def dataFiles(root: String): Seq[java.nio.file.Path] = {
    val s = Files.walk(Paths.get(root))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p => Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith(".")).toVector
    } finally s.close()
  }

  private def buildFragmented(): String = {
    val zone = Files.createTempDirectory("graft-compact-spec")
    zone.toFile.deleteOnExit()
    gen.EventGenerator.events(spark, 2000, seed = "cmp", days = 3)
      .select(
        to_json(struct(col("event_ts"), col("user_id"), col("event_type"))).as("value"),
        substring(col("event_ts"), 1, 10).as("date"),
        substring(col("event_ts"), 12, 2).as("hour"))
      .repartition(8) // unkeyed: every task writes into every partition dir
      .write.mode("overwrite").partitionBy("date", "hour").text(zone.toString)
    // a malformed line in one partition — must survive compaction
    val someDir = dataFiles(zone.toString).head.getParent
    Files.writeString(someDir.resolve("garbage.txt"), "not json at all\n")
    zone.toString
  }

  test("compaction collapses files per partition and conserves every line") {
    val zone = buildFragmented()
    val partitions = dataFiles(zone).map(_.getParent.toString).distinct
    val fragPerDir = dataFiles(zone).groupBy(_.getParent.toString).map(_._2.size)
    assert(fragPerDir.max > 4, s"fixture not fragmented: $fragPerDir")
    val before = Compaction.countLines(spark, zone)
    val out = Files.createTempDirectory("graft-compact-spec-out")
    out.toFile.deleteOnExit()
    Compaction.compactZone(spark, zone, out.toString)
    val after = Compaction.countLines(spark, out.toString)
    assert(after === before, "compaction lost or invented lines")
    val compactedPerDir = dataFiles(out.toString).groupBy(_.getParent.toString)
    assert(compactedPerDir.values.forall(_.size == 1),
      s"expected 1 file per partition, got ${compactedPerDir.view.mapValues(_.size).toMap}")
    assert(compactedPerDir.size === partitions.size, "partition dirs changed")
    // layout contract: partition dir names round-trip VERBATIM —
    // hour=00 must NOT come back as hour=0 (type inference off)
    def relDirs(root: String) = dataFiles(root)
      .map(p => Paths.get(root).relativize(p.getParent).toString).distinct.sorted
    assert(relDirs(out.toString) === relDirs(zone),
      "partition dir names were rewritten by compaction")
    // the malformed line is still present verbatim
    val garbage = spark.read.text(out.toString)
      .where(col("value") === "not json at all").count()
    assert(garbage === 1L, "malformed line did not survive compaction")
  }

  test("multi-file target salts within partitions") {
    val zone = buildFragmented()
    val out = Files.createTempDirectory("graft-compact-spec-out3")
    out.toFile.deleteOnExit()
    val before = Compaction.countLines(spark, zone)
    Compaction.compactZone(spark, zone, out.toString, filesPerPartition = 3)
    assert(Compaction.countLines(spark, out.toString) === before)
    val perDir = dataFiles(out.toString).groupBy(_.getParent.toString).map(_._2.size)
    assert(perDir.max <= 3, s"more files than target: $perDir")
  }

  test("KPIs are identical over fragmented and compacted zones") {
    val frag = graft.operators.PipelineQueries.writeFragmentedZone(spark, sf)
    val out = Files.createTempDirectory("graft-compact-spec-kpi")
    out.toFile.deleteOnExit()
    Compaction.compactZone(spark, frag, out.toString)
    val a = batch.DailyKpis.compute(spark, frag).collect().map(_.toSeq)
    val b = batch.DailyKpis.compute(spark, out.toString).collect().map(_.toSeq)
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
  }
}
