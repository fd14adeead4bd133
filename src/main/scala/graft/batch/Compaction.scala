package graft.batch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-files compaction for the partitioned raw zone (S-family;
  * the repair-side complement of RawIngest's pre-sink repartition):
  * a frequently-triggered streaming sink necessarily accumulates one
  * file per (partition, micro-batch) — thousands of small objects per
  * day at production trigger rates, which poisons every later scan
  * (open/seek cost per object, S3 LIST pressure, tiny splits).
  * Compaction rewrites each Hive partition's many files into
  * `filesPerPartition` outputs.
  *
  * RECORD-PRESERVING BY CONSTRUCTION: the zone is read as raw text
  * lines (partition columns discovered from the layout), never
  * parsed — malformed lines, which the reference deliberately
  * persists (ingest_clickstream_to_s3.py:44-51) and the KPI job
  * skips at read time (daily_kpis.py:104-107), survive compaction
  * byte-for-byte. A parsing compactor would silently rewrite or drop
  * them.
  *
  * Shape: one read, one shuffle keyed on the partition columns (plus
  * a line-hash salt when a partition needs several output files), one
  * partitioned write — cost proportional to the data rewritten. At
  * 100 TB this runs per-day behind the watermark (only sealed
  * partitions): compose the partition filter as a `.where` on the
  * returned reader or compact day roots individually.
  *
  * Reference anchor: the unique batch suffix per poll window
  * (ingest_clickstream_to_s3.py:68) is exactly this
  * one-object-per-window accumulation.
  */
object Compaction {

  /** Rewrite `zone` (line-oriented, `date=/hour=` Hive layout) into
    * `out` with `filesPerPartition` files per (date, hour).
    *
    * Partition values round-trip VERBATIM: partition-column type
    * inference is disabled for the read, because inferred types
    * silently rewrite the layout contract on the way out —
    * `hour=00` parses as integer 0 and is re-written as `hour=0`,
    * `date=` becomes DateType — breaking prefix-based pruners (the
    * reference's S3 prefix prune, daily_kpis.py:155-156) that expect
    * the documented `date=YYYY-MM-DD/hour=HH` dirs.
    *
    * Pure rewrite — no verification read. Callers wanting the
    * conservation check pay for it explicitly via [[countLines]]
    * (a second full scan of the zone; at 100 TB that doubles
    * compaction read I/O, so it must never be on the default path). */
  def compactZone(spark: SparkSession, zone: String, out: String,
                  filesPerPartition: Int = 1): Unit = {
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val saved = spark.conf.getOption(inferKey)
    spark.conf.set(inferKey, "false")
    try {
      val in = spark.read.text(zone) // value + discovered date/hour (as strings)
      val keys =
        if (filesPerPartition <= 1) Seq(col("date"), col("hour"))
        else Seq(col("date"), col("hour"),
          pmod(xxhash64(col("value")), lit(filesPerPartition)))
      in.repartition(keys: _*)
        .write.mode("overwrite")
        .partitionBy("date", "hour").text(out)
    } finally saved match {
      case Some(v) => spark.conf.set(inferKey, v)
      case None    => spark.conf.unset(inferKey)
    }
  }

  /** Full-scan line count of a line-oriented zone — the explicit,
    * opt-in half of the conservation check (count before and after,
    * compare). Spec-path only at fixture scale. */
  def countLines(spark: SparkSession, zone: String): Long =
    spark.read.text(zone).count()
}
