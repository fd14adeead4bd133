package graft.sources

import org.apache.spark.sql.SparkSession

/** S3A client configuration for the raw/curated zones — the last
  * config-tier SURVEY §2.1 S5 item (reference:
  * airflow/dags/ingest_clickstream_to_s3.py:77 passes
  * ServerSideEncryption=AES256 on every PUT; daily_kpis.py uploads
  * through the same bucket policy).
  *
  * Spark-first restatement: encryption and upload behavior are CLIENT
  * configuration, not per-write code — applied once to the Hadoop
  * conf, every parquet/JSONL sink in the engine inherits them, so no
  * operator carries storage-specific branches. The extra settings are
  * the 100 TB hygiene that goes with SSE in practice: a zero-rename
  * committer (S3 has no atomic rename — directory-rename commits are
  * O(files) copies and non-atomic) and bounded connection/thread
  * pools sized for many concurrent partitioned-sink uploads.
  *
  * No S3 endpoint exists in this container, so the only testable
  * surface is that the settings land on the session's Hadoop conf
  * (S3AConfSpec); the values themselves are the documented public
  * s3a contract.
  */
object S3AConf {

  /** fs.s3a.* settings mirroring the reference's upload semantics. */
  def settings(endpoint: Option[String] = None): Map[String, String] = Map(
    // SSE-AES256 on every object, as the reference's put_object does
    "fs.s3a.server-side-encryption-algorithm" -> "AES256",
    // zero-rename job commits: write-in-place with magic paths instead
    // of copy-based directory renames
    "fs.s3a.committer.name" -> "magic",
    "fs.s3a.committer.magic.enabled" -> "true",
    // stream uploads from memory/disk buffers instead of staging the
    // whole object, with bounded parallelism per executor
    "fs.s3a.fast.upload" -> "true",
    "fs.s3a.connection.maximum" -> "96",
    "fs.s3a.threads.max" -> "64"
  ) ++ endpoint.map("fs.s3a.endpoint" -> _)

  /** Apply to the session's Hadoop configuration (idempotent). */
  def apply(spark: SparkSession, endpoint: Option[String] = None): Unit =
    settings(endpoint).foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
}
