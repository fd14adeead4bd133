package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.RawIngest

/** ST8 backpressure: with maxFilesPerTrigger=1 the AvailableNow drain
  * must split the backlog into one micro-batch per input file — and
  * the partitioned output must be byte-equivalent to the unlimited
  * single-batch run. Rate limiting changes batch boundaries, never
  * results.
  */
class RawIngestBackpressureSpec extends SparkSpec {

  private def mkTemp(prefix: String) = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("maxFilesPerTrigger=1 drains one batch per file with identical output") {
    val in = mkTemp("graft-bp-in")
    // 4 input files, distinct hours so partitions are deterministic
    (0 until 4).foreach { i =>
      Files.writeString(java.nio.file.Paths.get(in, s"part-$i.json"),
        s"""{"event_ts":"2024-01-01T0$i:15:00Z","user_id":"u$i","session_id":"s$i","event_type":"pageview","price":null}""" + "\n")
    }
    def runAndRead(maxFiles: Option[Int]): (Long, Seq[(String, String, String)]) = {
      val out = mkTemp("graft-bp-out"); val ck = mkTemp("graft-bp-ck")
      val q = RawIngest.start(RawIngest.fromFiles(spark, in, maxFiles), out, ck)
      q.awaitTermination()
      // number of committed micro-batches = checkpoint offset files
      val nBatches = new java.io.File(s"$ck/offsets").listFiles()
        .count(f => f.getName.forall(_.isDigit))
      (nBatches.toLong,
        spark.read.schema("user_id STRING, event_type STRING, event_ts STRING")
          .json(s"$out/date=*/hour=*")
          .select(col("user_id"), col("event_type"), col("event_ts"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
          .toSeq.sorted)
    }
    val (nLimited, limitedRows) = runAndRead(Some(1))
    val (nUnlimited, unlimitedRows) = runAndRead(None)
    assert(nLimited === 4L, s"expected 4 micro-batches, got $nLimited")
    assert(nUnlimited === 1L, s"expected a single batch, got $nUnlimited")
    assert(limitedRows === unlimitedRows)
    assert(limitedRows.map(_._1).toSet === Set("u0", "u1", "u2", "u3"))
  }
}
