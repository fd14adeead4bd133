package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Schema-on-read robustness of Tables.load's events-ts normalization —
  * the round-6 fixture drift (driver regenerated events.parquet with a
  * different ts encoding and 26 queries analysis-failed on one line).
  * The loader must yield TimestampType WITH THE SAME VALUES for every
  * encoding the generator has ever produced: BIGINT nanoseconds
  * (rounds ≤5), TIMESTAMP_MICROS/NTZ (round 6+), and an
  * already-session-zoned TIMESTAMP.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-05T12:34:56.789Z
  private val instantMicros = 1704458096789000L

  private def loadFrom(dir: String) = Tables.load(spark, dir, "events")

  private def freshDir(): String =
    Files.createTempDirectory("tables-spec").toString

  test("BIGINT-nanos encoding loads as TimestampType with the right instant") {
    val dir = freshDir()
    // the legacy generator stored ts as INT64 nanoseconds; a plain
    // BIGINT column exercises the same LongType dispatch branch
    Seq((1L, instantMicros * 1000L)).toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val df = loadFrom(dir)
    assert(df.schema("ts").dataType == TimestampType, df.schema("ts").dataType)
    val got = df.select(unix_micros(col("ts"))).collect()(0).getLong(0)
    assert(got == instantMicros, s"$got != $instantMicros")
  }

  test("TIMESTAMP_NTZ (micros) encoding loads as TimestampType with the right instant") {
    val dir = freshDir()
    Seq(1L).toDF("event_id")
      .withColumn("ts",
        lit("2024-01-05 12:34:56.789").cast("timestamp_ntz"))
      .write.parquet(s"$dir/events.parquet")
    val df = loadFrom(dir)
    assert(df.schema("ts").dataType == TimestampType, df.schema("ts").dataType)
    // session TZ is UTC, so the NTZ wall-clock IS the instant
    val got = df.select(unix_micros(col("ts"))).collect()(0).getLong(0)
    assert(got == instantMicros, s"$got != $instantMicros")
  }

  test("session-zoned TIMESTAMP encoding passes through unchanged") {
    val dir = freshDir()
    Tables.withConfs(spark,
      "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS") {
      Seq(1L).toDF("event_id")
        .withColumn("ts", lit("2024-01-05 12:34:56.789").cast("timestamp"))
        .write.parquet(s"$dir/events.parquet")
    }
    val df = loadFrom(dir)
    assert(df.schema("ts").dataType == TimestampType, df.schema("ts").dataType)
    val got = df.select(unix_micros(col("ts"))).collect()(0).getLong(0)
    assert(got == instantMicros, s"$got != $instantMicros")
  }
}
