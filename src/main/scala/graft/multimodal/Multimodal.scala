package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support (brief §"multimodal columns"; SURVEY.md
  * §2.11 E5): media payloads are opaque `binary` columns carried next
  * to a typed metadata struct; decode/feature-extraction kernels run
  * batch-at-a-time inside `mapPartitions`.
  *
  * The container ships no image/audio codecs, so the DECODE KERNEL IS
  * A DETERMINISTIC STUB (`StubCodecs`) — everything around it is the
  * real 100 TB-shaped plumbing: schema, encoders, partition-parallel
  * batched execution, and frame explosion are exactly what a real
  * decoder would plug into (swap `StubCodecs.decodeFeatures` for a
  * JNI/FFM call and nothing else changes).
  *
  * Scale posture: payloads never enter a shuffle — feature extraction
  * is map-side; downstream joins/aggs run on the extracted compact
  * features. Media tables at rest should be partitioned by
  * (kind, bucket(media_id)) so one partition's payload batch fits
  * executor memory.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, durationMs: Int,
                       sampleRate: Int, format: String)
  case class Media(media_id: Long, kind: String, payload: Array[Byte],
                   meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  /** Deterministic synthetic media corpus derived from the `documents`
    * fixture ids (no media fixture ships): payload byte i is the pure
    * arithmetic pattern (doc_id·31 + i·7) mod 256, length
    * 100 + doc_id % 50 — so an independent engine can predict not just
    * `octet_length(payload)` but every byte (and therefore the stub
    * feature sums) from doc_id alone, which upgrades q_media_features
    * from rows-only to a full DuckDB hash gate. */
  def synthesize(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .map { id =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val len = (100 + id % 50).toInt
        val payload = StubCodecs.keystream(id, len)
        val meta = kind match {
          case "image" => MediaMeta(64 + (id % 64).toInt, 64, 0, 0, "png")
          case "audio" => MediaMeta(0, 0, 1000 + (id % 9000).toInt, 16000, "wav")
          case _       => MediaMeta(320, 240, 1000 + (id % 9000).toInt, 0, "mp4")
        }
        Media(id, kind, payload, meta)
      }
  }

  /** Batched feature extraction: partition-parallel, batch-at-a-time
    * over the payload column (the mapInPandas-equivalent batch shape —
    * a real decoder would process `batch` as one vectorized call). */
  def extractFeatures(media: Dataset[Media], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one vectorized "decode" call per batch
        batch.map { m =>
          MediaFeatures(m.media_id, m.kind, m.payload.length,
            StubCodecs.decodeFeatures(m.payload))
        }
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * timestamp — pure Spark (posexplode over a sequence), no codec
    * involved until a decoder consumes (media_id, frame_ts_ms). */
  def frameSample(media: DataFrame, everyMs: Int = 1000): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"), col("meta.durationMs").as("duration_ms"),
        posexplode(sequence(lit(0),
          (col("meta.durationMs") / everyMs).cast("int"))).as(Seq("frame_idx", "step")))
      .select(col("media_id"), col("frame_idx"),
        (col("step") * everyMs).cast("long").as("frame_ts_ms"))
}

/** Deterministic stand-ins for the codec layer (no image/audio libs in
  * this container). Real deployments replace these bodies; signatures
  * and batch shape are the contract. */
object StubCodecs {
  /** Arithmetic payload bytes, deterministic per (id, len): byte i =
    * (id·31 + i·7) mod 256. Predictable from id by ANY engine — the
    * cross-engine oracle contract for the multimodal gates. */
  def keystream(id: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) {
      out(i) = ((id * 31 + i * 7) % 256).toByte
      i += 1
    }
    out
  }

  /** STUB "decoder": 16-dim feature vector from byte histogram moments.
    * Bytes scale by 1/256 (a dyadic rational, exact in binary float),
    * so bin sums — and the double feat_sum downstream — are EXACT:
    * zero float-accumulation drift between this and an oracle that
    * computes sum(bytes)/256 in doubles. */
  def decodeFeatures(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      f(i % 16) += (payload(i) & 0xFF) / 256.0f
      i += 1
    }
    f
  }
}
