package graft.quality

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Data-freshness healthcheck
  * (reference: airflow/dags/ingest_healthcheck.py:13-33 — fail unless
  * ≥1 raw object under today's partition was modified within the last
  * `lookbackMin` minutes; early-exit on first hit).
  *
  * Implemented against the Hadoop FileSystem metadata listing (the
  * exists-semantics early exit of S9/A8): no data is read, only the
  * partition directory's file statuses — same I/O profile as the
  * reference's `list_objects_v2` prune.
  */
object Freshness {

  /** @return true iff a file under `root/date=<day>/` has modification
    *         time ≥ `nowMillis - lookbackMin`. */
  def isFresh(spark: SparkSession, root: String, day: String,
              lookbackMin: Int = 20,
              nowMillis: Long = System.currentTimeMillis()): Boolean = {
    val dir = new Path(s"$root/date=$day")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return false
    val cutoff = nowMillis - lookbackMin.toLong * 60000L
    val it = fs.listFiles(dir, true)
    var fresh = false
    while (!fresh && it.hasNext) { // early exit: first hit wins (A8)
      fresh = it.next().getModificationTime >= cutoff
    }
    fresh
  }

  /** Reference DAG behavior: raise on stale
    * (ingest_healthcheck.py:32-33). */
  def check(spark: SparkSession, root: String, day: String,
            lookbackMin: Int = 20): Unit =
    if (!isFresh(spark, root, day, lookbackMin))
      throw new IllegalStateException(
        s"No fresh raw object under $root/date=$day in last $lookbackMin min")
}
