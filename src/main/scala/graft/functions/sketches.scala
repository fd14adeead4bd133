package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernels for the sketch/vector operators (SURVEY.md
  * §2.11 E2/E3, §4 "custom Catalyst work is needed only for
  * extensions").
  *
  * Why custom expressions instead of SQL higher-order functions: HOF
  * lambdas are interpreted (no whole-stage codegen) and projection
  * collapse duplicates a referenced HOF column into every consumer —
  * a 64-bit SimHash written with `transform`/`aggregate` re-evaluated
  * its vote-vector 64×. These expressions are single-pass imperative
  * loops over the array data, called from generated code via a static
  * method, so the surrounding plan stays inside one codegen span and
  * each input row is touched exactly once.
  */

/** 64-bit SimHash over a token array: per-token xxhash64 votes per bit,
  * vote sign → bit (Charikar 2002 random-hyperplane sketch on the
  * token-set feature space). */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    Sketches.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature over a shingle array: `numHashes` independent
  * permutations approximated by seeded xxhash64; sig[p] = min over
  * shingles of h_p(shingle). Returns array<long> of length numHashes
  * (Broder 1997). Null/empty shingle arrays yield Long.MaxValue
  * entries. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> or array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val hashedInput: Boolean =
    child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(input: Any): Any =
    if (hashedInput) Sketches.minhashSigLong(input.asInstanceOf[ArrayData], numHashes)
    else Sketches.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (hashedInput) "minhashSigLong" else "minhashSig"
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.$fn($c, $numHashes)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** LSH band hashes from a token/shingle array in ONE pass: computes the
  * `numHashes`-perm MinHash signature, then hashes each of `bands`
  * contiguous rows-per-band slices. posexplode over the result gives
  * (band_index, band_hash) bucket keys — the candidate-join key for
  * near-dup detection at scale. */
case class MinHashBandHashes(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> or array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes"

  private lazy val hashedInput: Boolean =
    child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(input: Any): Any =
    if (hashedInput) Sketches.minhashBandHashesLong(input.asInstanceOf[ArrayData], numHashes, bands)
    else Sketches.minhashBandHashes(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (hashedInput) "minhashBandHashesLong" else "minhashBandHashes"
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.$fn($c, $numHashes, $bands)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandHashes =
    copy(child = newChild)
}

/** Cosine similarity between two float-array embeddings — fused
  * dot/norm/norm single loop, no intermediate arrays (vs. the
  * zip_with+aggregate HOF formulation which allocates per row and runs
  * interpreted). Null if either side is null, lengths differ, or a
  * norm is zero. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // cosineSim returns a boxed Double or null (length mismatch / zero
  // norm), so the generated code must null-check the result rather
  // than assign a primitive.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double r = graft.functions.Sketches.cosineSim($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float-array embedding. */
case class L2Norm(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override def nullSafeEval(input: Any): Any =
    Sketches.l2Norm(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.l2Norm($c)")

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Int8 symmetric-quantization relative reconstruction error of a
  * float-array embedding: with per-vector scale s = max|x|/levels and
  * codes floor(x/s + 0.5) (half-up — bit-identical floor semantics in
  * every engine, unlike round()), returns ‖x − code·s‖₂ / ‖x‖₂ — the
  * storage-compression audit a 100 TB embedding store runs before
  * switching the ANN index to int8. Null for empty or all-zero
  * vectors (no scale exists). One fused two-pass loop over the raw
  * float ArrayData (max-abs, then error+norm) — no quantized array is
  * ever materialized; the HOF formulation allocates two intermediate
  * arrays per row and runs interpreted. */
case class QuantErr(child: Expression, levels: Int = 127)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quant_err"

  override def nullSafeEval(input: Any): Any =
    Sketches.quantErr(input.asInstanceOf[ArrayData], levels)

  // quantErr returns a boxed Double or null (empty / all-zero vector),
  // so the generated code null-checks the result.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""java.lang.Double r = graft.functions.Sketches.quantErr($c, $levels);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantErr =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket id for a float-array embedding
  * (Charikar 2002): `bits` sign-bits of dot(v, h_i) packed into a
  * long, hyperplane components h_i[j] ∈ {-1,+1} derived from a seeded
  * hash — reproducible everywhere with zero shipped state. A single
  * native loop: the higher-order-function formulation codegens a
  * bits×dim expression tree (compile-time blowup) and runs
  * interpreted. */
case class HyperplaneBucket(child: Expression, bits: Int, seed: Long = 0L)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any =
    Sketches.hyperplaneBucket(input.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.hyperplaneBucket($c, $bits, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** Johnson-Lindenstrauss dimensionality reduction: `rand_project(vec,
  * k[, seed])` → array<float> of length k (see [[Sketches.randProject]]).
  * The map-side shrink step before storing/searching high-dim
  * embeddings: distances are preserved within 1±ε for
  * k = O(log n / ε²), and the deterministic hash-derived sign matrix
  * means no matrix is shipped, broadcast, or drifts between runs —
  * re-projection of new rows composes with stored projections. k ≤ 64
  * keeps the sign rows inside the memoized cache's long-hash scheme. */
case class RandProject(child: Expression, k: Int, seed: Long = 0L)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 1 || k > 64 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 1 <= k <= 64, got $k")
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "rand_project"

  override def nullSafeEval(input: Any): Any =
    Sketches.randProject(input.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.randProject($c, $k, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): RandProject =
    copy(child = newChild)
}

/** IVF coarse-quantizer assignment: id of the nearest centroid (by
  * cosine) to a vector, over a centroid list carried as an
  * `array<struct<c_id: long, cv: array<float>>>` column. One fused
  * loop over nlist centroids per row — the map-side replacement for
  * the corpus×nlist expand + per-vec_id window argmax, which shuffled
  * the whole corpus (VERDICT r1 finding #1). Ties break to the
  * earliest list entry (keep the list sorted by c_id). Null if either
  * side is null or no centroid has a defined cosine. */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == LongType &&
             f1.dataType.isInstanceOf[ArrayType] &&
             f1.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<struct<long, array<float>>>), got $other")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(v: Any, cents: Any): Any =
    Sketches.nearestCentroid(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      s"""java.lang.Long r = graft.functions.Sketches.nearestCentroid($v, $c);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

/** Top-`k` nearest centroids by cosine (r11): the soft-assignment
  * variant of [[NearestCentroid]] — one fused loop keeps a k-slot
  * insertion buffer instead of a scalar argmax, emitting the list ids
  * in descending-similarity order. This is the SemDeDup / multi-probe
  * IVF primitive: assigning each vector to its top-k lists makes a
  * pair's "shares a cluster" probability the OR over k² list
  * combinations, recovering the near-boundary pairs a hard
  * single-assignment partitioning drops. Same map-side contract as
  * the argmax form (broadcast centroid list, no corpus shuffle); ties
  * break to the earliest list entry (keep the list sorted by c_id).
  * Null if either side is null; entries with undefined cosine are
  * skipped, so the result can be shorter than k. */
case class NearestCentroids(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == LongType &&
             f1.dataType.isInstanceOf[ArrayType] &&
             f1.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
        if (k >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<struct<long, array<float>>>), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(v: Any, cents: Any): Any =
    Sketches.nearestCentroids(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      s"${ev.value} = graft.functions.Sketches.nearestCentroids($v, $c, $k);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestCentroids =
    copy(left = newLeft, right = newRight)
}

/** ANY-gram bloom membership (r11): true iff any element of a
  * long-array column MIGHT be in the bloom sketch — the map-side
  * candidate filter of bloom-pruned decontamination (one fused loop
  * with early exit, vs an interpreted `exists` HOF lambda wrapping
  * might_contain per element). Hashing matches the build side
  * exactly: the sketch is built over xxhash64(gram) (seed 42, the
  * XxHash64 expression default wrapped by BloomJoin.buildSketch), so
  * the probe hashes each gram with XXH64.hashLong(g, 42) before the
  * filter's own internal hash. The sketch rides as a constructor
  * constant (a broadcast-sized literal, the InjectRuntimeFilter
  * discipline) and deserializes ONCE per executor via a transient
  * lazy val / codegen reference object — never per row. */
case class BloomAnyLong(child: Expression, sketch: Array[Byte])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_any"

  @transient private lazy val bf =
    org.apache.spark.util.sketch.BloomFilter.readFrom(sketch)

  override def nullSafeEval(input: Any): Any =
    Sketches.bloomAny(input.asInstanceOf[ArrayData], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.Sketches.bloomAny($a, $bfRef);"
    })
  }

  // Value equality over the sketch BYTES (r12, advisor): the synthetic
  // case-class equals compares Array[Byte] by reference, so two
  // semantically identical bloom_any expressions never compared equal
  // and plan canonicalization / subexpression elimination treated them
  // as distinct. Child + content equality restores reuse if the
  // expression ever appears in multiple plan branches.
  override def equals(other: Any): Boolean = other match {
    case b: BloomAnyLong =>
      child == b.child && java.util.Arrays.equals(sketch, b.sketch)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(sketch)

  override protected def withNewChildInternal(newChild: Expression): BloomAnyLong =
    copy(child = newChild)
}

/** round-half-away-from-zero on the BINARY double value — the
  * C/DuckDB/Postgres `round(double, n)` convention: scale by 10^n
  * (IEEE multiply), round the resulting binary value half away from
  * zero, divide back. Spark's builtin `round` instead rounds the
  * shortest DECIMAL STRING repr (BigDecimal.valueOf), so the two
  * diverge whenever the shortest repr displays an exact half that the
  * binary value sits just below (e.g. 189/40 → "4.725" → Spark 4.73,
  * C/DuckDB 4.72). Declared queries round with THIS expression so
  * results hash-match a DuckDB oracle bit-for-bit (SURVEY.md §7 risk
  * register: rounding parity). */
case class RoundBin(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, int), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "round_bin"

  override def nullSafeEval(x: Any, s: Any): Any =
    Sketches.roundBin(x.asInstanceOf[Double], s.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, s) => s"graft.functions.Sketches.roundBin($x, $s)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): RoundBin =
    copy(left = newLeft, right = newRight)
}

/** Deterministic arithmetic payload synthesis for the multimodal
  * fixture (Multimodal.synthesize): byte i = (id·31 + i·7) mod 256,
  * `len` bytes. A native expression (not a typed Dataset.map) keeps
  * fixture synthesis inside whole-stage codegen next to the rest of
  * the media projection — the codegen'd loop writes the byte array
  * directly, no row-at-a-time encoder round-trip. */
case class PayloadBytes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (long, int), got $other")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "payload_bytes"

  override def nullSafeEval(id: Any, len: Any): Any =
    Sketches.payloadBytes(id.asInstanceOf[Long], len.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, len) => s"graft.functions.Sketches.payloadBytes($id, $len)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PayloadBytes =
    copy(left = newLeft, right = newRight)
}

/** Sorted distinct xxhash64 fingerprints of a token array's n-grams —
  * the whole shingling pipeline (n-gram formation → hash → distinct →
  * sort) as ONE fused pass. Replaces the
  * `array_sort(array_distinct(transform(sequence(...), concat(...))))`
  * HOF chain, which (a) runs interpreted, (b) materializes every
  * n-gram STRING, and (c) gets re-evaluated per consumer under
  * projection collapse. Token hashes are computed once and combined
  * order-sensitively per gram, so each token is hashed exactly once
  * regardless of n. Downstream set operations (jaccard, MinHash)
  * consume the 8-byte fingerprints — identical set semantics to the
  * string n-grams modulo 64-bit collisions (~|grams|²/2⁶⁵ per
  * document: vanishing), at a fraction of the compare/shuffle cost. */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    Sketches.ngramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.ngramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** Thresholded Jaccard over two SORTED, DISTINCT string arrays:
  * returns |a∩b| / |a∪b| when ≥ `threshold`, else null (→ one
  * filter on isNotNull). A single merge-walk over the sorted arrays —
  * vs the array_intersect/array_union formulation, which builds a
  * per-pair hash set, boxes every element, and walks both arrays
  * twice — with a positional early exit: j ≥ t requires
  * |a∩b| ≥ t·(|a|+|b|)/(1+t), so the walk aborts the moment the
  * remaining elements cannot reach that floor (subsumes the
  * min/max length-ratio prefilter). The dominant cost of blocked
  * all-pairs near-dup (SURVEY.md §2.10 E2) runs through this. */
case class JaccardGe(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> or two array<bigint>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_ge"

  private lazy val hashedInput: Boolean =
    left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    if (hashedInput)
      Sketches.jaccardGeLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)
    else
      Sketches.jaccardGe(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (hashedInput) "jaccardGeLong" else "jaccardGe"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double r = graft.functions.Sketches.$fn($a, $b, $threshold);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardGe =
    copy(left = newLeft, right = newRight)
}

/** Thresholded directed CONTAINMENT |a ∩ b| / |a| over two sorted
  * distinct long arrays — [[JaccardGe]]'s sibling for the
  * sub-document-duplication verify (containmentJoin): one fused
  * merge-walk, early exit once the remaining elements cannot reach
  * the threshold, returns the exact containment when ≥ t, else null.
  * Boundary exactness at rational t: IEEE division is correctly
  * rounded, so a pair sitting exactly AT num/den produces the same
  * double as the t literal, and the next ratio below differs by
  * ≥ 1/|a| ≫ ulp. */
case class ContainmentGe(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "containment_ge"

  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.containmentGeLong(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double r = graft.functions.Sketches.containmentGeLong($a, $b, $threshold);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ContainmentGe =
    copy(left = newLeft, right = newRight)
}

/** Static kernels shared by interpreted eval and generated code. */
object Sketches {
  private final val XxSeed = 42L

  /** See [[PayloadBytes]]. */
  def payloadBytes(id: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) {
      // mask, not %: the signed modulo goes negative for negative ids
      // (or id*31 overflow) and would diverge from the `b & 0xFF`
      // reading in decodeFeatures; & 0xFF is identical for all
      // non-negative inputs and total over the (long, int) domain
      out(i) = ((id * 31 + i * 7) & 0xFF).toByte
      i += 1
    }
    out
  }

  private def hashString(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashString(tokens.getUTF8String(i), XxSeed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Fused n-gram fingerprinting (see [[NgramHashes]]): token hashes
    * once, order-sensitive gram combine, sort, in-place dedup. */
  def ngramHashes(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      th(i) = if (toks.isNullAt(i)) 0L else hashString(toks.getUTF8String(i), XxSeed)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var acc = XXH64.hashLong(n.toLong, XxSeed)
      var j = 0
      while (j < n) { acc = XXH64.hashLong(th(i + j) ^ acc, XxSeed); j += 1 }
      out(i) = acc
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }

  /** Merge-walk thresholded Jaccard over sorted distinct LONG arrays
    * (the [[NgramHashes]] representation) — same walk as the string
    * variant with 8-byte compares instead of byte-string compares. */
  def jaccardGeLong(a: ArrayData, b: ArrayData, t: Double): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return null // empty union: jaccard undefined
    val need = math.ceil(t * (na + nb) / (1.0 + t) - 1e-9).toInt
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      if (inter + math.min(na - i, nb - j) < need) return null // early exit
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val jac = inter.toDouble / (na + nb - inter)
    if (jac >= t) jac else null
  }

  /** Merge-walk thresholded directed containment |a∩b|/|a| (see
    * [[ContainmentGe]]). Inputs MUST be sorted distinct long arrays. */
  def containmentGeLong(a: ArrayData, b: ArrayData, t: Double): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0) return null // empty contained set: containment undefined
    val need = math.ceil(t * na - 1e-9).toInt
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      if (inter + math.min(na - i, nb - j) < need) return null // early exit
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val c = inter.toDouble / na
    if (c >= t) c else null
  }

  /** Merge-walk thresholded Jaccard (see [[JaccardGe]]). Inputs MUST
    * be sorted distinct arrays; null elements are not expected. */
  def jaccardGe(a: ArrayData, b: ArrayData, t: Double): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return null // empty union: jaccard undefined
    // floor on the intersection size: i/(na+nb-i) >= t  <=>
    // i >= t*(na+nb)/(1+t); epsilon guards the float ceil at equality
    val need = math.ceil(t * (na + nb) / (1.0 + t) - 1e-9).toInt
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      if (inter + math.min(na - i, nb - j) < need) return null // early exit
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val jac = inter.toDouble / (na + nb - inter)
    if (jac >= t) jac else null
  }

  /** Golden-ratio-stepped seeds give independent-enough permutations
    * without shipping permutation state. */
  private def permSeed(p: Int): Long = XxSeed + p.toLong * 0x9E3779B97F4A7C15L

  def minhashSigArray(shingles: ArrayData, numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        var p = 0
        while (p < numHashes) {
          val h = hashString(s, permSeed(p))
          if (h < sig(p)) sig(p) = h
          p += 1
        }
      }
      i += 1
    }
    sig
  }

  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData =
    new GenericArrayData(minhashSigArray(shingles, numHashes))

  /** MinHash over PRE-HASHED shingles ([[NgramHashes]] output): the
    * p-th permutation re-hashes the 8-byte fingerprint with the p-th
    * seed — no string re-hashing per permutation. */
  def minhashSigArrayLong(hashes: ArrayData, numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val base = hashes.getLong(i)
      var p = 0
      while (p < numHashes) {
        val h = XXH64.hashLong(base, permSeed(p))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    sig
  }

  def minhashSigLong(hashes: ArrayData, numHashes: Int): ArrayData =
    new GenericArrayData(minhashSigArrayLong(hashes, numHashes))

  def minhashBandHashesLong(hashes: ArrayData, numHashes: Int, bands: Int): ArrayData =
    bandHashes(minhashSigArrayLong(hashes, numHashes), numHashes, bands)

  def minhashBandHashes(shingles: ArrayData, numHashes: Int, bands: Int): ArrayData =
    bandHashes(minhashSigArray(shingles, numHashes), numHashes, bands)

  private def bandHashes(sig: Array[Long], numHashes: Int, bands: Int): ArrayData = {
    val rows = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // order-sensitive combine of the band's signature rows
      var acc = XXH64.hashLong(b.toLong, XxSeed)
      var r = 0
      while (r < rows) {
        acc = XXH64.hashLong(sig(b * rows + r) ^ acc, XxSeed)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  def cosineSim(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Sign-matrix cache for hyperplane buckets: one bits×dim ±1 table
    * per (bits, dim, seed), hash-derived, built once per JVM. The seed
    * selects an INDEPENDENT hyperplane family — the multi-table LSH
    * amplification lever (L independent tables OR-ed raise recall to
    * 1-(1-p)^L while each table stays a cheap bucketed probe). */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Double]]()

  private def signs(bits: Int, dim: Int, seed: Long): Array[Double] =
    signCache.computeIfAbsent((bits, dim, seed), { case (b, d, s) =>
      val tableSeed = XXH64.hashLong(s, XxSeed)
      val m = new Array[Double](b * d)
      var i = 0
      while (i < b * d) {
        m(i) = if ((XXH64.hashLong(i.toLong, tableSeed) & 1L) == 0L) 1.0 else -1.0
        i += 1
      }
      m
    })

  def hyperplaneBucket(v: ArrayData, bits: Int): Long =
    hyperplaneBucket(v, bits, 0L)

  def hyperplaneBucket(v: ArrayData, bits: Int, seed: Long): Long = {
    val n = v.numElements()
    val m = signs(bits, n, seed)
    var out = 0L
    var i = 0
    while (i < bits) {
      var d = 0.0
      var j = 0
      val row = i * n
      while (j < n) { d += v.getFloat(j) * m(row + j); j += 1 }
      if (d > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  def roundBin(x: Double, scale: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val power = math.pow(10.0, scale.toDouble)
    val scaled = x * power
    if (java.lang.Double.isInfinite(scaled)) return x
    // exact half-away-from-zero of the binary value of `scaled`
    // (naive floor(x+0.5) double-rounds near the boundary)
    val r = new java.math.BigDecimal(math.abs(scaled))
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    math.copySign(r, x) / power
  }

  def nearestCentroid(v: ArrayData, cents: ArrayData): java.lang.Long = {
    val n = cents.numElements()
    var bestId: java.lang.Long = null
    var best = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val row = cents.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val c = cosineSim(v, row.getArray(1))
          if (c != null && c.doubleValue() > best) {
            best = c.doubleValue()
            bestId = java.lang.Long.valueOf(row.getLong(0))
          }
        }
      }
      i += 1
    }
    bestId
  }

  /** See [[NearestCentroids]]: k-slot insertion top-k over the same
    * single fused loop. k is a literal knob (2–4 in practice), so the
    * per-candidate insertion shift is O(k) with tiny constants —
    * cheaper than a heap at these sizes. Descending-similarity order;
    * first-seen (lowest list index) wins ties. */
  def nearestCentroids(v: ArrayData, cents: ArrayData, k: Int): ArrayData = {
    val n = cents.numElements()
    val ids = new Array[Long](k)
    val sims = new Array[Double](k)
    var filled = 0
    var i = 0
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val row = cents.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val c = cosineSim(v, row.getArray(1))
          if (c != null) {
            val s = c.doubleValue()
            if (filled < k || s > sims(filled - 1)) {
              // insertion position: strictly-greater keeps first-seen
              // order among equals (list is sorted by c_id)
              var p = math.min(filled, k - 1)
              while (p > 0 && sims(p - 1) < s) {
                ids(p) = ids(p - 1); sims(p) = sims(p - 1); p -= 1
              }
              ids(p) = row.getLong(0); sims(p) = s
              if (filled < k) filled += 1
            }
          }
        }
      }
      i += 1
    }
    new GenericArrayData(
      if (filled == k) ids else java.util.Arrays.copyOf(ids, filled))
  }

  /** See [[BloomAnyLong]]: early-exit any-membership over the gram
    * array; hashes each element with XXH64(seed 42) to match the
    * xxhash64-wrapped build side. */
  def bloomAny(a: ArrayData,
               bf: org.apache.spark.util.sketch.BloomFilter): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) &&
          bf.mightContainLong(XXH64.hashLong(a.getLong(i), 42L))) return true
      i += 1
    }
    false
  }

  /** See [[QuantErr]]. Double math over the float values — identical
    * bits to any engine evaluating the same formula over
    * CAST(embedding AS DOUBLE[]), since /, floor, *, and sequential +
    * are all IEEE-exact-deterministic. */
  def quantErr(a: ArrayData, levels: Int): java.lang.Double = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(a.getFloat(i).toDouble)
      if (x > m) m = x
      i += 1
    }
    if (m == 0.0) return null
    val s = m / levels
    var err2 = 0.0
    var norm2 = 0.0
    i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val d = x - math.floor(x / s + 0.5) * s
      err2 += d * d
      norm2 += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(err2) / math.sqrt(norm2))
  }

  def l2Norm(a: ArrayData): Double = {
    var na = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    math.sqrt(na)
  }

  /** Sparse-sign Johnson-Lindenstrauss projection (Achlioptas 2001):
    * out_j = (1/√k)·Σ_i v_i·s_ij with s ∈ {±1} from the same memoized
    * deterministic sign matrix as [[hyperplaneBucket]] — so the map is
    * identical on every executor and across engines without shipping a
    * matrix. Linear by construction; E[‖out‖²] = ‖v‖². */
  def randProject(v: ArrayData, k: Int, seed: Long): ArrayData = {
    val n = v.numElements()
    val m = signs(k, n, seed)
    val out = new Array[Float](k)
    val scale = 1.0 / math.sqrt(k.toDouble)
    var j = 0
    while (j < k) {
      var d = 0.0
      var i = 0
      val row = j * n
      while (i < n) { d += v.getFloat(i) * m(row + i); i += 1 }
      out(j) = (d * scale).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }
}
