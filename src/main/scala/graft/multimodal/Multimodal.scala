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
    val id = col("doc_id")
    val kind = when(id % 3 === 0, "image")
      .when(id % 3 === 1, "audio").otherwise("video")
    val dur = (lit(1000) + id % 9000).cast("int")
    // pure column projection (native payload_bytes expression) — the
    // whole synthesis is one WholeStageCodegen span; the previous
    // typed Dataset.map paid a per-row encoder round-trip inside the
    // three timed media gates
    graft.Tables.load(spark, dir, "documents")
      .select(
        id.as("media_id"),
        kind.as("kind"),
        graft.functions.F.payloadBytes(id, (lit(100) + id % 50).cast("int")).as("payload"),
        struct(
          when(kind === "image", (lit(64) + id % 64).cast("int"))
            .when(kind === "video", lit(320)).otherwise(lit(0)).as("width"),
          when(kind === "image", lit(64))
            .when(kind === "video", lit(240)).otherwise(lit(0)).as("height"),
          when(kind === "image", lit(0)).otherwise(dur).as("durationMs"),
          when(kind === "audio", lit(16000)).otherwise(lit(0)).as("sampleRate"),
          when(kind === "image", lit("png"))
            .when(kind === "audio", lit("wav")).otherwise(lit("mp4")).as("format")
        ).as("meta"))
      .as[Media]
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

  /** Payload-DEDUP corpus (r13, the r12 verdict's "thinnest category"
    * item): a second deterministic media corpus whose payloads carry
    * deliberate EXACT duplicates and PERCEPTUAL near-duplicates, so
    * payload-grain dedup has ground truth an independent engine can
    * pin from doc_id arithmetic alone (the oracle never reads a byte).
    *
    * Structure per media_id: pattern group g = id % 17, variant
    * v = (id DIV 17) % 3 — class (g, v) determines the payload
    * exactly, so ids sharing a class are EXACT byte duplicates
    * (q_media_dedup's axis) and ids sharing only g are near-dups
    * (variants of one "image", q_media_neardup's axis). Bytes:
    * 15 xxhash64 words of (g, word_idx) → 120 well-mixed base bytes
    * (the keystream's +7 byte ramp would make every dHash bit 0 — a
    * perceptual hash needs texture), then ONE variant byte patched at
    * position 10 + 9·v (inside the dHash grid, a different grid row
    * per variant — a small perturbation, like a re-encode artifact),
    * then a class-id tail byte at position 120 (OUTSIDE the grid) that
    * makes cross-class payloads byte-distinct by construction even on
    * the ~1e-5 chance a patch reproduces the original byte. Within a
    * group, two variants differ in ≤ 2 patched bytes → ≤ 4 flipped
    * dHash bits; across groups the hashes are independent (expected
    * Hamming ≈ 32). All pure column projection → one codegen span. */
  def synthesizeDedupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val g = (id % 17).cast("long")
    val v = expr("(doc_id DIV 17) % 3").cast("long")
    def word(i: Int) =
      unhex(lpad(hex(xxhash64(lit("graft-media"), g, lit(i))), 16, "0"))
    val base = concat((0 until 15).map(word): _*)
    val patchPos = (lit(11) + lit(9) * v).cast("int") // 1-based: 11/20/29
    val noise = unhex(lpad(hex(
      pmod(xxhash64(lit("graft-noise"), g, v), lit(256))), 2, "0"))
    val classByte = unhex(lpad(hex(g * 3 + v), 2, "0"))
    val payload = concat(
      base.substr(lit(1), patchPos - 1), noise,
      base.substr(patchPos + 1, lit(120)), classByte)
    graft.Tables.load(spark, dir, "documents")
      .select(id.as("media_id"), payload.as("payload"))
  }

  /** 64-bit dHash over a binary payload: the standard
    * difference-hash — bit (r, c) = luma[r][c] > luma[r][c+1] over an
    * 8-row × 9-column grid. A real deployment decodes + grayscales +
    * downscales the image to that 8×9 grid first; here the STUB
    * "decode" (same discipline as [[StubCodecs]]) reads the first 72
    * payload bytes AS the grid, so the Spark-side shape — one long per
    * payload, banding, Hamming verification — is exactly what a real
    * perceptual hash plugs into. Unsigned byte compare = Spark's
    * lexicographic BinaryType ordering on 1-byte slices; the fold is
    * a native HOF over a 64-element sequence (payloads are hashed
    * once, at rep grain after exact collapse). */
  def dhash64(payloadCol: String): org.apache.spark.sql.Column =
    // shiftleft, not acc*2: the 64th bit would overflow a signed long
    // under ANSI arithmetic; shifting wraps into the sign bit, which
    // is exactly the packing wanted
    expr(s"""aggregate(sequence(0, 63), 0L, (acc, i) ->
      shiftleft(acc, 1) | IF(substring($payloadCol, (i DIV 8) * 9 + (i % 8) + 1, 1) >
                             substring($payloadCol, (i DIV 8) * 9 + (i % 8) + 2, 1), 1L, 0L))""")
}

/** Deterministic stand-ins for the codec layer (no image/audio libs in
  * this container). Real deployments replace these bodies; signatures
  * and batch shape are the contract. */
object StubCodecs {
  /** Arithmetic payload bytes, deterministic per (id, len): byte i =
    * (id·31 + i·7) mod 256. Predictable from id by ANY engine — the
    * cross-engine oracle contract for the multimodal gates. Single
    * source of truth is the native kernel behind the `payload_bytes`
    * expression ([[graft.functions.PayloadBytes]]). */
  def keystream(id: Long, len: Int): Array[Byte] =
    graft.functions.Sketches.payloadBytes(id, len)

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
